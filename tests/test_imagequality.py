"""Image quality gates + duplicate-caption detection (operators/imagequality)."""

import pyspark.sql.functions as F
import pytest

from sparkschema.operators.imagequality import (
    caption_printable_ratio,
    duplicate_caption_groups,
    image_quality_frame,
    image_quality_report,
)


def _frame(spark, rows):
    return spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string, "
              "caption string")


GOOD = ("ok-1", bytearray(b"\x00" * (9 + 64 * 64 * 3)), 64, 64, "raw",
        "a fine caption here")


def test_gates_and_precedence(spark):
    rows = [
        GOOD,
        # dims: too small / NULL dims / pixel bomb
        ("dim-1", None, 16, 64, "raw", "a fine caption here"),
        ("dim-2", None, None, 64, "raw", "a fine caption here"),
        ("dim-3", None, 65536, 65536, "raw", "a fine caption here"),
        # aspect: 512/64 = 8 > 4
        ("asp-1", None, 512, 64, "raw", "a fine caption here"),
        # bpp: 10 bytes over 64*64 px = 0.0024 < 0.05
        ("bpp-1", bytearray(b"\x00" * 10), 64, 64, "raw",
         "a fine caption here"),
        # caption: NULL / too short / one token / control chars
        ("cap-1", None, 64, 64, "raw", None),
        ("cap-2", None, 64, 64, "raw", "tiny"),
        ("cap-3", None, 64, 64, "raw", "single-token-caption"),
        ("cap-4", None, 64, 64, "raw", "bad caption \x00\x01\x02\x03\x04"),
        # dims fails first even though caption also fails (precedence)
        ("pre-1", None, 16, 64, "raw", None),
    ]
    out = {r["image_id"]: r for r in
           image_quality_frame(_frame(spark, rows)).collect()}
    assert out["ok-1"]["keep"] and out["ok-1"]["drop_reason"] is None
    for iid in ("dim-1", "dim-2", "dim-3", "pre-1"):
        assert out[iid]["drop_reason"] == "dims", iid
    assert out["asp-1"]["drop_reason"] == "aspect"
    assert out["bpp-1"]["drop_reason"] == "bpp"
    for iid in ("cap-1", "cap-2", "cap-3", "cap-4"):
        assert out[iid]["drop_reason"] == "caption", iid


def test_null_bytes_pass_bpp_and_report_sums(spark):
    rows = [GOOD,
            ("nb-1", None, 64, 64, "raw", "a fine caption here"),
            ("cap-1", None, 64, 64, "raw", None),
            ("asp-1", None, 512, 64, "raw", "a fine caption here")]
    rep = image_quality_report(_frame(spark, rows)).collect()[0]
    assert rep["total"] == 4 and rep["kept"] == 2
    assert rep["drop_caption"] == 1 and rep["drop_aspect"] == 1
    assert (rep["kept"] + rep["drop_dims"] + rep["drop_aspect"]
            + rep["drop_bpp"] + rep["drop_caption"]) == rep["total"]


def test_printable_ratio_edges(spark):
    df = spark.createDataFrame(
        [("", ), ("abcd", ), ("ab\x00\x01", ), (None, ), ("\t\n ok", )],
        "c string")
    vals = [r[0] for r in
            df.select(caption_printable_ratio(F.col("c"))).collect()]
    assert vals[0] == 1.0 and vals[1] == 1.0
    assert vals[2] == pytest.approx(0.5)
    assert vals[3] is None
    assert vals[4] == 1.0  # \t and \n are allowed whitespace, not control


def test_bytes_col_none_skips_bpp(spark):
    rows = [("bpp-1", bytearray(b"\x00" * 10), 64, 64, "raw",
             "a fine caption here")]
    out = image_quality_frame(_frame(spark, rows), bytes_col=None).collect()[0]
    assert out["bpp_ok"] and out["keep"]


def test_duplicate_caption_groups(spark):
    rows = [
        ("a", None, 64, 64, "raw", "Same   Caption"),
        ("b", None, 64, 64, "raw", "same caption"),   # normalizes equal
        ("b", None, 64, 64, "raw", "same caption"),   # same image again
        ("c", None, 64, 64, "raw", "unique caption"),
        ("d", None, 64, 64, "raw", None),
        ("e", None, 64, 64, "raw", "   "),            # empty after trim
    ]
    got = duplicate_caption_groups(_frame(spark, rows)).collect()
    assert len(got) == 1
    g = got[0]
    assert g["n_rows"] == 3 and g["n_images"] == 2 and g["min_id"] == "a"


def test_quality_frame_is_shuffle_and_python_free(spark, tmp_path):
    path = str(tmp_path / "imgs")
    _frame(spark, [GOOD]).write.parquet(path)
    plan = image_quality_frame(spark.read.parquet(path)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_bytes_col_none_prunes_byte_read(spark, tmp_path):
    path = str(tmp_path / "imgs2")
    _frame(spark, [GOOD]).write.parquet(path)
    f = image_quality_frame(spark.read.parquet(path), bytes_col=None) \
        .select("image_id", "keep")
    plan = f._jdf.queryExecution().executedPlan().toString()
    import re
    schema = re.search(r"ReadSchema: struct<([^>]*)>", plan).group(1)
    assert "bytes" not in schema  # the binary column is pruned from the scan


# ---------------- hostile differential fuzz vs DuckDB ----------------
#
# Every reseed of the pipeline fuzzers has found a real bug; the quality
# gates get their own lane — and its FIRST run found one: under ANSI
# (Spark 4 default) the aspect/bpp `/` raised DIVIDE_BY_ZERO on a
# zero-dim row, crashing the whole gate job. The operator now uses
# try_divide, whose NULL-on-zero-divisor semantics equal DuckDB float
# division exactly, so every gate boolean, drop_reason, keep, and the
# one-row report are compared row-by-row. Corpus: NULL / zero /
# negative / overflow-scale dims, extreme aspects, truncated and
# oversized payloads, control-char / whitespace-only / emoji / 1-char /
# 5k-char captions.

_FUZZ_SEED = 20261008


def _hostile_rows():
    import random
    rng = random.Random(_FUZZ_SEED)
    caps = [
        None, "", " ", "   ", "\t\t", "\n", "a", "ab cd ef gh",
        "one", "one two", "x" * 5000, "x " * 40,
        "ctrl\x00\x01\x02 chars here", "\x00\x01\x02\x03\x04\x05\x06",
        "mostly printable with one \x7f del", "caption\twith\ttabs ok",
        "\U0001f600 emoji caption words", "你好 世界 caption",
        " leading and trailing  ", "ALL CAPS FINE CAPTION",
    ]
    dims = [None, 0, -5, 1, 63, 64, 65, 127, 128, 4096, 16384, 2_000_000]
    rows = []
    i = 0
    for cap in caps:
        for _ in range(3):
            w = rng.choice(dims)
            h = rng.choice(dims)
            blen = rng.choice([None, 0, 10, 9 + 64 * 64 * 3,
                               rng.randint(1, 200_000)])
            b = None if blen is None else bytearray(b"\x5a" * blen)
            rows.append((f"f-{i:04d}", b, w, h, "raw", cap))
            i += 1
    return rows


def test_quality_gates_hostile_fuzz_vs_duckdb(spark, tmp_path):
    import duckdb

    path = str(tmp_path / "hostile_imgs")
    _frame(spark, _hostile_rows()).repartition(4).write.parquet(path)
    df = spark.read.parquet(path)

    kw = dict(min_dim=64, max_aspect=4.0, min_bpp=0.05, max_bpp=16.0,
              min_caption_chars=8, min_caption_tokens=2,
              min_printable_ratio=0.9)
    got = {r["image_id"]: (r["dims_ok"], r["aspect_ok"], r["bpp_ok"],
                           r["caption_ok"], r["drop_reason"], r["keep"])
           for r in image_quality_frame(df, **kw).collect()}
    report = image_quality_report(df, **kw).collect()[0]

    con = duckdb.connect()
    sql = f"""
        with g as (
          select image_id,
            coalesce(w >= 64 and h >= 64
                     and cast(w as bigint) * h <= 16777216, false) as d_ok,
            coalesce(cast(greatest(w, h) as double)
                     / least(w, h) <= 4.0, false) as a_ok,
            coalesce(cast(octet_length(bytes) as double)
                       / (cast(w as bigint) * h) >= 0.05
                     and cast(octet_length(bytes) as double)
                       / (cast(w as bigint) * h) <= 16.0, true) as b_ok,
            regexp_replace(caption, '^ +| +$', '', 'g') as ctrim,
            case when length(caption) = 0 then 1.0
                 else 1.0 - cast(length(caption) - length(regexp_replace(
                        caption,
                        '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]', '',
                        'g')) as double) / length(caption) end as pr
          from '{path}/*.parquet'),
        k as (
          select image_id, d_ok, a_ok, b_ok,
                 coalesce(length(ctrim) >= 8
                          and len(regexp_split_to_array(ctrim, '\\s+')) >= 2
                          and pr >= 0.9, false) as c_ok
          from g)
        select image_id, d_ok, a_ok, b_ok, c_ok,
               case when not d_ok then 'dims'
                    when not a_ok then 'aspect'
                    when not b_ok then 'bpp'
                    when not c_ok then 'caption' end as reason
        from k
    """
    want = {r[0]: (r[1], r[2], r[3], r[4], r[5], r[5] is None)
            for r in con.execute(sql).fetchall()}
    assert set(got) == set(want)
    diffs = [(k, got[k], want[k]) for k in got if got[k] != want[k]]
    assert not diffs, diffs[:5]
    reasons = [v[4] for v in want.values()]
    assert report["total"] == len(want)
    assert report["kept"] == sum(1 for v in reasons if v is None)
    for reason in ("dims", "aspect", "bpp", "caption"):
        assert report[f"drop_{reason}"] == sum(
            1 for v in reasons if v == reason), reason


def test_quality_frame_is_streaming_safe(spark, tmp_path):
    """The gates are stateless Column expressions, so the SAME
    image_quality_frame call works under readStream (the shape a
    continuous ingest pipeline uses to quarantine rows before they ever
    land): streaming per-row verdicts must equal the batch run."""
    src = str(tmp_path / "src")
    _frame(spark, [
        GOOD,
        ("dim-1", None, 16, 64, "raw", "a fine caption here"),
        ("cap-1", None, 64, 64, "raw", None),
        ("asp-1", None, 512, 64, "raw", "a fine caption here"),
    ]).write.parquet(src)

    batch = {r["image_id"]: (r["drop_reason"], r["keep"])
             for r in image_quality_frame(spark.read.parquet(src)).collect()}

    stream = spark.readStream.schema(
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string").parquet(src)
    q = (image_quality_frame(stream)
         .select("image_id", "drop_reason", "keep")
         .writeStream.outputMode("append")
         .format("memory").queryName("imgq_stream")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["image_id"]: (r["drop_reason"], r["keep"])
           for r in spark.sql("select * from imgq_stream").collect()}
    assert got == batch


# ---------------------------------------------------------------------------
# aspect-ratio training buckets


def _dims(spark, rows):
    return spark.createDataFrame(rows, "image_id string, w int, h int")


def _ref_bucket(w, h, buckets):
    """Exact pure-Python reference: same boundary-crossing rule, with
    Python's arbitrary-precision ints standing in for the operator's
    int64/decimal tiers."""
    if w is None or h is None or w <= 0 or h <= 0 \
            or w > 2**31 - 1 or h > 2**31 - 1:
        return None
    bid = 0
    for (aw, ah), (bw, bh) in zip(buckets, buckets[1:]):
        if w * w * ah * bh > h * h * aw * bw:
            bid += 1
    return bid


def test_aspect_assign_matches_log_argmin(spark):
    """The int64 rule IS nearest-in-log-ratio: cross-check every seeded
    (w, h) against a float argmin over the ladder (away from exact
    ties, where floats are trustworthy)."""
    import math
    import random

    from sparkschema.operators.imagequality import (
        ASPECT_BUCKETS, aspect_bucket_assign)

    rng = random.Random(20260915)
    rows = [(f"r-{i}", rng.randint(1, 4096), rng.randint(1, 4096))
            for i in range(300)]
    out = {r.image_id: r for r in
           aspect_bucket_assign(_dims(spark, rows)).collect()}
    for iid, w, h in rows:
        got = out[iid].bucket_id
        assert got == _ref_bucket(w, h, ASPECT_BUCKETS), (iid, w, h)
        lr = math.log(w / h)
        d = [abs(lr - math.log(bw / bh)) for bw, bh in ASPECT_BUCKETS]
        assert got == d.index(min(d)), (iid, w, h)
        assert (out[iid].bucket_w, out[iid].bucket_h) == ASPECT_BUCKETS[got]


def test_aspect_boundary_tie_takes_lower_bucket(spark):
    """An exact geometric-midpoint tie (r^2 == b_i*b_j) must take the
    LOWER bucket on every engine — strict >, no float wobble."""
    from sparkschema.operators.imagequality import aspect_bucket_assign

    out = aspect_bucket_assign(
        _dims(spark, [("sq", 777, 777)]), buckets=[(1, 2), (2, 1)]
    ).collect()[0]
    assert out.bucket_id == 0 and (out.bucket_w, out.bucket_h) == (1, 2)


def test_aspect_invalid_dims_get_null_bucket(spark):
    from sparkschema.operators.imagequality import aspect_bucket_assign

    rows = [("n1", None, 256), ("n2", 256, None), ("z", 0, 100),
            ("neg", 100, -5), ("ok", 256, 256)]
    out = {r.image_id: r for r in
           aspect_bucket_assign(_dims(spark, rows)).collect()}
    for iid in ("n1", "n2", "z", "neg"):
        r = out[iid]
        assert r.bucket_id is None and r.bucket_w is None \
            and r.bucket_h is None, r
    assert out["ok"].bucket_id is not None


def test_aspect_bucket_validation(spark):
    from sparkschema.operators.imagequality import aspect_bucket_assign

    df = _dims(spark, [("a", 1, 1)])
    with pytest.raises(ValueError):
        aspect_bucket_assign(df, buckets=[(2, 1), (1, 2)])  # unsorted
    with pytest.raises(ValueError):
        aspect_bucket_assign(df, buckets=[(1, 1), (1, 1)])  # equal ratio
    with pytest.raises(ValueError):
        aspect_bucket_assign(df, buckets=[(1, 1), (0, 2)])  # non-positive
    with pytest.raises(ValueError):
        aspect_bucket_assign(df, buckets=[])
    with pytest.raises(ValueError):
        aspect_bucket_assign(df, buckets=[(1, 2), (2**31, 1)])  # > int32


def test_aspect_overflow_tier_is_exact(spark):
    """Dims above the int64-safe bound (~1.7 M px on the default
    ladder) must take the decimal tier and stay EXACT — under ANSI the
    naive int64 product would crash with ARITHMETIC_OVERFLOW; beyond
    int32 the row is NULL-bucketed (input_hint declares int32 dims)."""
    from sparkschema.operators.imagequality import (
        ASPECT_BUCKETS, aspect_bucket_assign)

    rows = [("big-w", 2_000_000, 1), ("big-h", 1, 2_000_000),
            ("big-sq", 1_800_000, 1_700_000),
            ("max32", 2**31 - 1, 2**31 - 1),
            ("beyond32-w", 2**31, 100), ("beyond32-h", 100, 2**31),
            ("small", 640, 480)]
    df = spark.createDataFrame(rows, "image_id string, w long, h long")
    out = {r.image_id: r.bucket_id
           for r in aspect_bucket_assign(df).collect()}
    for iid, w, h in rows:
        assert out[iid] == _ref_bucket(w, h, ASPECT_BUCKETS), (iid, w, h)
    assert out["beyond32-w"] is None and out["beyond32-h"] is None
    assert out["big-w"] == len(ASPECT_BUCKETS) - 1
    assert out["big-h"] == 0


def test_aspect_random_ladders_fuzz_exact(spark):
    """Seeded fuzz: random strictly-increasing ladders × hostile dims
    (NULL/zero/negative/1/huge/beyond-int32) vs the arbitrary-precision
    Python reference — the assignment rule must be exact on BOTH tiers
    for any ladder a user can configure."""
    import random
    from fractions import Fraction

    from sparkschema.operators.imagequality import aspect_bucket_assign

    rng = random.Random(_FUZZ_SEED)
    hostile = [None, 0, -5, 1, 63, 640, 65535, 2_000_000,
               2**31 - 1, 2**31]
    for trial in range(5):
        raw = {(rng.randint(1, 4096), rng.randint(1, 4096))
               for _ in range(rng.randint(2, 6))}
        ladder = sorted(raw, key=lambda p: Fraction(p[0], p[1]))
        ladder = [p for i, p in enumerate(ladder)
                  if i == 0 or Fraction(*p) != Fraction(*ladder[i - 1])]
        if len(ladder) < 2:
            continue
        rows = [(f"t{trial}-{i}",
                 rng.choice(hostile + [rng.randint(1, 2**31 - 1)]),
                 rng.choice(hostile + [rng.randint(1, 2**31 - 1)]))
                for i in range(60)]
        df = spark.createDataFrame(rows, "image_id string, w long, h long")
        out = {r.image_id: r.bucket_id
               for r in aspect_bucket_assign(df, buckets=ladder).collect()}
        bad = [(iid, w, h, out[iid], _ref_bucket(w, h, ladder))
               for iid, w, h in rows if out[iid] != _ref_bucket(w, h, ladder)]
        assert not bad, (ladder, bad[:5])


def test_aspect_report_conserves_and_counts_exact_fits(spark):
    from sparkschema.operators.imagequality import aspect_bucket_report

    rows = [("a", 64, 512), ("b", 512, 64), ("c", 256, 256),
            ("d", 128, 256), ("e", None, 9), ("f", 3, 0)]
    rep = aspect_bucket_report(_dims(spark, rows)).collect()
    assert sum(r.n_images for r in rep) == len(rows)
    by_id = {r.bucket_id: r for r in rep}
    assert by_id[None].n_images == 2 and by_id[None].n_exact_fit == 0
    # 256x256 sits exactly on the 1024x1024 bucket ratio
    assert by_id[4].n_exact_fit == 1
    # 64x512 (1:8) lands in bucket 0 (1:4) but is NOT an exact fit
    assert by_id[0].n_images == 1 and by_id[0].n_exact_fit == 0


def test_aspect_assign_is_shuffle_and_python_free(spark, tmp_path):
    from sparkschema.operators.imagequality import (
        aspect_bucket_assign, aspect_bucket_report)

    path = str(tmp_path / "dims")
    _dims(spark, [("a", 640, 480)]).write.parquet(path)
    plan = aspect_bucket_assign(spark.read.parquet(path)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan
    rplan = aspect_bucket_report(spark.read.parquet(path)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert rplan.count("Exchange") <= 2  # partial→final (+AQE read)
    assert "Python" not in rplan


def test_caption_fastpath_matches_counting_forms(spark):
    """r6: the token fast path (contains-any-\\s for k=2, static for k<=1)
    and the printable-ratio fast path (regex find gate before the exact
    translate count) must keep caption_ok's truth table bit-identical to
    the plain counting forms, for every threshold shape."""
    from pyspark.sql import functions as F

    from sparkschema.operators.imagequality import (_CTRL_CHARS,
                                                    image_quality_frame)

    caps = [None, "", " ", "\t", "ok caption here", "one", "a b",
            "a\tb", "a\nb", "a\x0bb", "a\fb", "a\rb", "two  spaces",
            " lead and trail ", "ctrl\x01here and more", "\x7f\x7f\x7f",
            "mostly clean text\x02", "x" * 50, ("y" * 9 + "\x03") * 5,
            "café au lait", "가 jamo", "a\x00b c",
            "nine ch\x04r", "exactly ten chars\x05\x06"]
    rows = [(i, c, 100, 100) for i, c in enumerate(caps)]
    df = spark.createDataFrame(rows, "id int, caption string, w int, h int")
    for k in (0, 1, 2, 3):
        for ratio in (0.5, 0.9, 1.0):
            got = {r["id"]: r["caption_ok"] for r in image_quality_frame(
                df, bytes_col=None, min_caption_tokens=k,
                min_printable_ratio=ratio).select("id", "caption_ok")
                .collect()}
            # reference: the counting forms, composed verbatim
            cap, cap_trim = F.col("caption"), F.trim(F.col("caption"))
            tok_n = F.regexp_count(cap_trim, F.lit("\\s+")) + 1
            n = F.length(cap)
            ctrl = n - F.length(F.translate(cap, _CTRL_CHARS, ""))
            pr = F.when(n == 0, F.lit(1.0)).otherwise(
                1.0 - ctrl.cast("double") / n.cast("double"))
            ref_ok = F.coalesce(
                (F.length(cap_trim) >= 8) & (tok_n >= k) & (pr >= ratio),
                F.lit(False))
            want = {r["id"]: r["ok"] for r in df.select(
                "id", ref_ok.alias("ok")).collect()}
            assert got == want, (k, ratio,
                                 {i: (got[i], want[i]) for i in got
                                  if got[i] != want[i]})
