"""End-to-end image-corpus curation plan (plans/image_curation)."""

import pyspark.sql.functions as F
import pytest

from sparkschema.functions.imagecodec import FMT_CODES, MAGIC, encode, synth_pixels
from sparkschema.operators.caching import CacheScope
from sparkschema.plans.image_curation import STAGES, curate_images


def _hdr(w: int, h: int, fmt: str) -> bytes:
    return (MAGIC + w.to_bytes(2, "little") + h.to_bytes(2, "little")
            + bytes([FMT_CODES[fmt]]))


def _img(seed: str, w: int = 64, h: int = 64, fmt: str = "raw") -> bytearray:
    return bytearray(encode(synth_pixels(seed, w, h), fmt))


CAP = "a perfectly fine caption here"


def _corpus():
    rows = [
        ("keep-00", _img("k0"), 64, 64, "raw", CAP + " zero"),
        ("keep-01", _img("k1", 128, 64), 128, 64, "raw", CAP + " one"),
        # stage: null_bytes
        ("nb-00", None, 64, 64, "raw", CAP),
        # stage: structural (bad magic)
        ("st-00", bytearray(b"XXXX" + bytes(_img("s0"))[4:]), 64, 64, "raw",
         CAP),
        # stage: dims (valid container, tiny image)
        ("di-00", _img("d0", 16, 16), 16, 16, "raw", CAP),
        # stage: aspect (512x64 = 8:1)
        ("as-00", _img("a0", 512, 64), 512, 64, "raw", CAP),
        # stage: bpp (structurally-OK rawz header, near-empty payload)
        ("bp-00", bytearray(_hdr(64, 64, "rawz") + b"\x01\x02"), 64, 64,
         "rawz", CAP),
        # stage: caption (one token)
        ("ca-00", _img("c0"), 64, 64, "raw", "singletoken"),
        # stage: exact_dup (same bytes as keep-00, bigger id)
        ("xd-00", _img("k0"), 64, 64, "raw", CAP + " zero"),
        # stage: undecodable (rawz header, garbage payload in the bpp
        # band: gates pass, decode fails)
        ("ud-00", bytearray(_hdr(64, 64, "rawz")
                            + b"\x99" * (64 * 64 * 2)), 64, 64, "rawz", CAP),
        # stage: near_dup (jpg re-encode of keep-01's pixels, bigger id)
        ("nd-00", _img("k1", 128, 64, "jpg"), 128, 64, "jpg",
         CAP + " one prime"),
    ]
    # caption_cap: four distinct images sharing one normalized caption
    for i in range(4):
        rows.append((f"cc-{i:02d}", _img(f"cc{i}"), 64, 64, "raw",
                     "Stock   Photo Placeholder Image"))
    return rows


def _frame(spark, rows):
    return spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string, "
              "caption string")


def test_stage_attribution_and_report(spark):
    scope = CacheScope()
    res = curate_images(_frame(spark, _corpus()), phash_near_dup=True,
                        caption_cap=2, scope=scope)
    try:
        got = {r["image_id"]: r["drop_stage"]
               for r in res.flagged.collect()}
        assert got["keep-00"] is None and got["keep-01"] is None
        assert got["nb-00"] == "null_bytes"
        assert got["st-00"] == "structural"
        assert got["di-00"] == "dims"
        assert got["as-00"] == "aspect"
        assert got["bp-00"] == "bpp"
        assert got["ca-00"] == "caption"
        assert got["xd-00"] == "exact_dup"
        assert got["ud-00"] == "undecodable"
        assert got["nd-00"] == "near_dup"
        cc = [got[f"cc-{i:02d}"] for i in range(4)]
        assert sorted(x for x in cc if x is not None) == \
            ["caption_cap", "caption_cap"]

        rep = res.report.collect()[0]
        assert rep["n_input"] == len(_corpus())
        assert rep["n_kept"] + sum(rep[f"n_{s}"] for s in STAGES) \
            == rep["n_input"]
        for s, n in (("null_bytes", 1), ("structural", 1), ("dims", 1),
                     ("aspect", 1), ("bpp", 1), ("caption", 1),
                     ("exact_dup", 1), ("undecodable", 1), ("near_dup", 1),
                     ("caption_cap", 2)):
            assert rep[f"n_{s}"] == n, s
        assert rep["n_kept"] == 4  # keep-00, keep-01, 2 of the cc group

        kept_ids = {r["image_id"] for r in res.curated.collect()}
        assert {"keep-00", "keep-01"} <= kept_ids
        assert res.curated.columns == _frame(spark, []).columns
    finally:
        scope.release()


def test_precedence_first_failing_stage_wins(spark):
    # tiny dims AND duplicate bytes AND bad caption -> attributed to dims
    rows = [("a-0", _img("p0", 16, 16), 16, 16, "raw", "x"),
            ("a-1", _img("p0", 16, 16), 16, 16, "raw", "x")]
    scope = CacheScope()
    try:
        res = curate_images(_frame(spark, rows), scope=scope)
        got = {r["image_id"]: r["drop_stage"] for r in res.flagged.collect()}
        assert got == {"a-0": "dims", "a-1": "dims"}
    finally:
        scope.release()


def test_precomputed_sigs_match_inplace_decode(spark):
    scope = CacheScope()
    df = _frame(spark, _corpus())
    try:
        inplace = curate_images(df, phash_near_dup=True, scope=scope)
        # export-and-reuse path: feed the signature table back in
        sigs = inplace.phash_sigs.collect()
        sig_df = spark.createDataFrame(sigs, "id string, phash long")
        reused = curate_images(df, phash_near_dup=True, phash_sigs=sig_df,
                               scope=scope)
        a = sorted((r["image_id"], r["drop_stage"])
                   for r in inplace.flagged.collect())
        b = sorted((r["image_id"], r["drop_stage"])
                   for r in reused.flagged.collect())
        assert a == b
    finally:
        scope.release()


def test_split_and_disabled_stages(spark):
    rows = [("s-0", _img("q0"), 64, 64, "raw", CAP),
            ("s-1", _img("q0"), 64, 64, "raw", CAP)]  # exact dup pair
    res = curate_images(_frame(spark, rows), exact=False,
                        split_weights={"train": 0.9, "val": 0.1})
    rep = res.report.collect()[0]
    assert rep["n_exact_dup"] == 0 and rep["n_kept"] == 2
    out = res.curated.collect()
    assert all(r["split"] in ("train", "val") for r in out)


def test_decode_only_runs_over_survivors(spark, tmp_path):
    """The pHash decode stage's input must be restricted to gate
    survivors — dropped rows never reach the Python decode (the scale
    property: the decode bill is paid by survivors only). Since the
    slim-frame restructure the restriction is a semi-join against the
    survivor ids (below the zero-copy MapInArrow decode) instead of
    inline gate filters; both rows-reaching-decode sets are identical.
    Also pins that the decode is the mapInArrow node (not a pandas UDF:
    the zero-copy buffer-slicing path)."""
    path = str(tmp_path / "imgs")
    _frame(spark, _corpus()).write.parquet(path)
    df = spark.read.parquet(path)
    scope = CacheScope()
    try:
        res = curate_images(df, phash_near_dup=True, scope=scope)
        plan = res.phash_sigs._jdf.queryExecution().executedPlan().toString()
        assert "MapInArrow" in plan
        # survivor restriction sits below the decode: a LeftSemi join
        # against the slim frame's alive ids
        decode_part = plan.split("MapInArrow", 1)[1]
        assert "LeftSemi" in decode_part
    finally:
        scope.release()


# ------------- randomized full-pipeline differential fuzz -------------
#
# The oracle query covers one deterministic slice; this lane drives the
# SAME parameterized DuckDB replay (__spark_entry__._sql_image_curation)
# over seeded RANDOM corpora — random dims/fmts, fmt-label lies,
# truncations, null payloads, exact-dup re-keys, raw/jpg near-dup
# twins, boilerplate captions, hostile captions — and compares the
# engine's per-row drop_stage (strictly stronger than the report).

_FUZZ_SEED = 20261008


def _random_corpus(rng):
    import random  # noqa: F401

    caps_pool = [
        None, "", " ", "one", "a decent caption with words",
        "another perfectly good caption", "ctrl\x00\x01 chars here",
        "Stock   Photo Placeholder Image", "short",
        "a caption that is long enough to pass the char gate",
    ]
    rows = []
    i = 0
    for _ in range(rng.randint(50, 80)):
        w = rng.choice([32, 64, 96, 128, 256])
        h = rng.choice([32, 64, 96, 128, 256])
        fmt = rng.choice(["raw", "raw", "rawz", "jpg", "png", "tiff"])
        enc_fmt = fmt if fmt != "tiff" else "raw"
        buf = bytearray(encode(synth_pixels(f"fz-{i}", w, h), enc_fmt))
        roll = rng.random()
        if roll < 0.06:
            buf = None                              # null_bytes
        elif roll < 0.14:
            buf = buf[: max(9, len(buf) // 2)]      # truncation
        elif roll < 0.18:
            buf = bytearray(b"ZZZZ") + buf[4:]      # bad magic
        cap = rng.choice(caps_pool)
        rows.append((f"fz-{i:04d}", buf, w, h, fmt, cap))
        i += 1
    # exact dups: re-key a few rows byte-identically
    for r in [r for r in list(rows) if r[1] is not None][:5]:
        rows.append((r[0] + "-x", r[1], r[2], r[3], r[4], r[5]))
    # near-dup twins: raw + jpg of the same pixels
    for j in range(6):
        px = synth_pixels(f"fz-nd-{j}", 128, 128)
        cap = f"a fuzz planted near duplicate pair {j}"
        rows.append((f"fz-nda-{j:02d}", bytearray(encode(px, "raw")),
                     128, 128, "raw", cap))
        rows.append((f"fz-ndb-{j:02d}", bytearray(encode(px, "jpg")),
                     128, 128, "jpg", cap + " prime"))
    return rows


@pytest.mark.parametrize("trial", range(3))
def test_image_curation_random_fuzz_vs_duckdb(spark, tmp_path, trial):
    import random

    import duckdb

    import __spark_entry__ as entry_mod
    from sparkschema.operators.imagedup import image_phash_frame

    rng = random.Random(_FUZZ_SEED + trial)
    raw = str(tmp_path / "raw")
    sigs = str(tmp_path / "sigs")
    _frame(spark, _random_corpus(rng)).repartition(4).write.parquet(raw)
    image_phash_frame(spark.read.parquet(raw),
                      spread_partitions=4).write.parquet(sigs)

    kw = dict(min_dim=rng.choice([64, 96, 128]),
              max_aspect=rng.choice([2.0, 3.0, 4.0]),
              min_bpp=rng.choice([0.5, 1.0]),
              max_bpp=3.5,
              hamming_max=rng.choice([8, 10, 12]),
              caption_cap=rng.choice([1, 2, 3]))
    scope = CacheScope()
    try:
        res = curate_images(spark.read.parquet(raw),
                            phash_sigs=spark.read.parquet(sigs),
                            exact=True, phash_near_dup=True, scope=scope,
                            **kw)
        got = sorted((r["image_id"], r["drop_stage"])
                     for r in res.flagged.collect())
    finally:
        scope.release()

    con = duckdb.connect()
    want = sorted(tuple(r) for r in con.execute(
        entry_mod._sql_image_curation(
            f"{raw}/*.parquet", f"{sigs}/*.parquet",
            row_level=True, **kw)).fetchall())
    diffs = [(a, b) for a, b in zip(got, want) if a != b]
    assert len(got) == len(want)
    assert not diffs, (kw, diffs[:5])
