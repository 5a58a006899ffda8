"""Checkpoint-manifest resumability (north_rule; SURVEY.md §2.7).

The reference is strictly batch/synchronous; "resumable" here means batch
checkpointing: a **manifest** of completed work units, each carrying
lineage (the exact input files — with Iceberg, the snapshot id would join
them) and the unit's metrics. A restarted run anti-joins the unit list
against the manifest and processes only the remainder.

Atomicity: each unit commits as its own ``unit-<sha>.json`` written via
temp-file + ``os.replace`` (atomic on POSIX), so a crash mid-commit never
yields a half-recorded unit and concurrent writers of *different* units
don't conflict.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import time
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


def _unit_id(files: list[str]) -> str:
    return hashlib.sha256("\n".join(sorted(files)).encode()).hexdigest()[:24]


class Manifest:
    """Directory of per-unit commit records."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    def meta(self) -> dict:
        try:
            with open(os.path.join(self.path, "_meta.json"),
                      encoding="utf-8") as f:
                return json.load(f)
        except (OSError, json.JSONDecodeError):
            return {}

    def write_meta(self, meta: dict) -> None:
        final = os.path.join(self.path, "_meta.json")
        tmp = final + f".tmp.{os.getpid()}"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(meta, f)
        os.replace(tmp, final)

    def pin_meta(self, meta: dict) -> dict:
        """First-writer-wins meta pinning. Two concurrent FIRST runs can
        compute different ``n_units`` (the file set is in flux); with a
        plain last-writer-wins write both proceed on their own value and
        the loser's committed units are bucketed under a count the
        manifest no longer records — on resume they never match and
        silently re-run (ADVICE r4). ``O_CREAT|O_EXCL`` makes exactly one
        writer win; every racer then re-reads and buckets with the SAME
        pinned meta. Returns the authoritative meta."""
        final = os.path.join(self.path, "_meta.json")
        # write-complete-then-link: os.link is atomic AND exclusive, so
        # the pinned file either doesn't exist or is COMPLETE. The
        # previous O_EXCL-then-write shape could be killed mid-dump,
        # leaving a torn winner that permanently defeated pinning (every
        # later pin got FileExistsError and meta() parsed {} forever),
        # and a losing racer could read the winner's still-empty file
        # (review find r5). A crash here leaves only an orphan tmp file.
        tmp = final + f".pin.{os.getpid()}"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(meta, f)
        try:
            try:
                os.link(tmp, final)
            except FileExistsError:
                # existing pin is either good (normal losing racer) or a
                # torn file left by a pre-link-era crash — heal the
                # latter under an exclusive lock (see _heal_torn_meta)
                if not self.meta():
                    self._heal_torn_meta(tmp, final)
        finally:
            try:
                os.unlink(tmp)
            except OSError:
                pass
        authoritative = self.meta()
        # meta() swallows a torn/concurrent read as {} — fall back to our
        # own value rather than proceeding unpinned
        return authoritative if authoritative else meta

    def _heal_torn_meta(self, tmp: str, final: str) -> None:
        """Repair a torn legacy ``_meta.json`` so a pin can land.

        The heal (unlink the unparseable file, link our complete tmp)
        must be EXCLUSIVE: with two concurrent healers, B's unlink could
        remove A's freshly linked GOOD pin and re-open the divergence
        pinning exists to prevent (review find r5). An ``O_EXCL`` lock
        file serializes it — exactly one racer heals; losers spin-read
        until the winner's pin parses (microseconds away). A lock older
        than 60 s is a healer that died mid-heal: steal it and retry. If
        no parseable pin appears within the deadline the caller's
        own-value fallback applies, same residual as any torn read."""
        lock = final + ".heal.lock"
        deadline = time.time() + 5.0
        while time.time() < deadline:
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                if self.meta():
                    return  # the winning healer's pin landed
                try:
                    if time.time() - os.path.getmtime(lock) > 60.0:
                        os.unlink(lock)  # stale lock: healer crashed
                        continue
                except OSError:
                    continue  # lock vanished between open and stat
                time.sleep(0.05)
                continue
            os.close(fd)
            try:
                if not self.meta():  # re-check under the lock
                    try:
                        os.unlink(final)
                    except OSError:
                        pass
                    try:
                        os.link(tmp, final)
                    except FileExistsError:
                        pass
            finally:
                try:
                    os.unlink(lock)
                except OSError:
                    pass
            return

    def completed(self) -> dict[str, dict]:
        out = {}
        for p in glob.glob(os.path.join(self.path, "unit-*.json")):
            try:
                with open(p, encoding="utf-8") as f:
                    rec = json.load(f)
                out[rec["unit_id"]] = rec
            except (json.JSONDecodeError, KeyError, OSError):
                continue  # torn file from a crashed writer: unit reruns
        return out

    def record(self, unit_id: str, files: list[str], metrics: dict,
               snapshot_id: str | None = None) -> None:
        rec = {
            "unit_id": unit_id,
            "input_files": sorted(files),
            "snapshot_id": snapshot_id,  # Iceberg snapshot when available
            "metrics": metrics,
            "committed_at": time.time(),
        }
        final = os.path.join(self.path, f"unit-{unit_id}.json")
        tmp = final + f".tmp.{os.getpid()}"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(rec, f)
        os.replace(tmp, final)


@dataclass
class ResumableResult:
    processed_units: int
    skipped_units: int
    unit_metrics: list[dict]


def run_resumable(
    spark: SparkSession,
    input_path: str,
    manifest_path: str,
    process_unit: Callable[[DataFrame, list[str]], dict],
    files_per_unit: int = 8,
    snapshot_id: str | None = None,
) -> ResumableResult:
    """Process a parquet dataset in resumable units of input files.

    ``process_unit(df, files) -> metrics`` runs the validation job for one
    unit; its returned metrics are committed to the manifest with the
    unit's lineage. Already-committed units are skipped on restart.

    ``snapshot_id`` pins the run to an Iceberg snapshot
    (sources.tables.table_snapshot_id); committed units carry it, and a
    restart against a DIFFERENT snapshot refuses to mix lineages —
    re-validating changed data needs a fresh manifest, matching Iceberg's
    snapshot-isolation model.
    """
    files = sorted(
        glob.glob(os.path.join(input_path, "**", "*.parquet"), recursive=True)
    ) or ([input_path] if os.path.isfile(input_path) else
          sorted(glob.glob(os.path.join(input_path, "*"))))
    if not files:
        raise FileNotFoundError(f"no input files under {input_path}")

    manifest = Manifest(manifest_path)
    # STABLE unit membership: a file's unit is a hash of its name, with
    # the unit COUNT pinned in the manifest on first run. The previous
    # positional chunking shifted every unit boundary when one new file
    # landed (or files_per_unit changed), so a resume re-ran fully
    # committed units and orphaned their metrics (review find r4). With
    # hash buckets, a new file perturbs exactly the one unit it joins —
    # that unit's id (the hash of its file list) changes and only it
    # re-runs.
    meta = manifest.meta()
    n_units = meta.get("n_units")
    if n_units is None:
        n_units = max(1, (len(files) + files_per_unit - 1) // files_per_unit)
        # first-writer-wins + re-read: concurrent first runs all bucket
        # with the same pinned count (ADVICE r4)
        n_units = int(manifest.pin_meta({"n_units": n_units})["n_units"])
    buckets: dict[int, list[str]] = {}
    for f in files:
        b = int.from_bytes(
            hashlib.blake2b(os.path.basename(f).encode(),
                            digest_size=8).digest(), "big") % n_units
        buckets.setdefault(b, []).append(f)
    units = [sorted(buckets[b]) for b in sorted(buckets)]
    done = manifest.completed()

    prior_all = {r.get("snapshot_id") for r in done.values()}
    prior = prior_all - {None}
    if snapshot_id is not None:
        if prior and prior != {snapshot_id}:
            raise ValueError(
                f"manifest {manifest_path} is pinned to snapshot(s) "
                f"{sorted(prior)} but this run reads {snapshot_id}; "
                f"use a fresh manifest to validate a different snapshot")
        if None in prior_all:
            # pre-pinning units have no lineage to compare — resuming a
            # pinned run on top of them would silently mix lineages
            raise ValueError(
                f"manifest {manifest_path} contains units committed without "
                f"a snapshot_id; a pinned run (snapshot {snapshot_id}) cannot "
                f"prove they read the same data — use a fresh manifest")
    elif prior:
        # the manifest is pinned but this restart carries no snapshot_id:
        # skipping the check would silently bypass snapshot isolation
        raise ValueError(
            f"manifest {manifest_path} is pinned to snapshot(s) "
            f"{sorted(prior)}; pass snapshot_id= to resume it (or use a "
            f"fresh manifest for unpinned runs)")

    processed = skipped = 0
    unit_metrics: list[dict] = []
    for unit_files in units:
        uid = _unit_id(unit_files)
        if uid in done:
            skipped += 1
            unit_metrics.append(done[uid]["metrics"])
            continue
        df = spark.read.parquet(*unit_files)
        metrics = process_unit(df, unit_files)
        manifest.record(uid, unit_files, metrics, snapshot_id=snapshot_id)
        processed += 1
        unit_metrics.append(metrics)
    return ResumableResult(processed, skipped, unit_metrics)
