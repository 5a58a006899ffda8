"""Seeded differential fuzz for the event-time operators (sessionize /
asof_join) against DuckDB twins built on DIFFERENT algorithms:

- sessionize (Spark native session_window merge) vs a lag + cumulative-
  sum gap rule — timestamps drawn on a COARSE grid so exact-gap edges,
  ties, and single-event sessions actually occur (the sf0.01 oracle's
  organic microsecond timestamps never land on the closed-bound edge);
- asof_join (union → key shuffle → running last(ignorenulls)) vs
  DuckDB's native ASOF LEFT JOIN — with left/right timestamp ties,
  NULL payloads in matched rows, keys with empty right sides, and
  left rows before any right row.

Right-side rows are deduplicated on (key, ts) per asof_join's
documented at-most-one-row-per-timestamp contract (both engines break
intra-right ties arbitrarily otherwise).
"""

import datetime as dt
import random

import duckdb

from sparkschema.operators.sessions import asof_join, sessionize

SEED = 20261008
T0 = dt.datetime(2024, 1, 1)
GAP_MIN = 10  # coarse grid step == 5 min, so diffs hit exactly GAP often


def _grid_ts(rng, n_slots=200):
    # 5-minute grid => inter-event gaps are multiples of 5 min, so the
    # exact-gap (closed-bound) edge and ties both occur constantly
    return T0 + dt.timedelta(minutes=5 * rng.randrange(n_slots))


def test_sessionize_fuzz_vs_duckdb_lag_rule(spark):
    rng = random.Random(SEED)
    rows = [(rng.randrange(8), _grid_ts(rng)) for _ in range(600)]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp")

    s = sessionize(df, "user_id", "ts", f"{GAP_MIN} minutes")
    got = sorted((r.user_id, r.session_start, r.session_end, r.n_events)
                 for r in s.collect())

    con = duckdb.connect()
    con.execute("create table ev (user_id int, ts timestamp)")
    con.executemany("insert into ev values (?, ?)", rows)
    want = sorted(tuple(r) for r in con.execute(f"""
        with x as (
          select user_id, ts,
                 case when lag(ts) over (partition by user_id order by ts)
                           is null
                      or ts - lag(ts) over (partition by user_id order by ts)
                           > interval '{GAP_MIN} minutes'
                      then 1 else 0 end as ns
          from (select distinct user_id, ts from ev)),
        s as (select user_id, ts,
                     sum(ns) over (partition by user_id order by ts
                                   rows unbounded preceding) as sid
              from x),
        g as (select user_id, sid, min(ts) as st, max(ts) as en,
                     count(*) as n
              from s group by 1, 2)
        select user_id, st, en + interval '{GAP_MIN} minutes',
               cast(n as bigint) from g
    """).fetchall())

    # Spark counts duplicate (user, ts) rows as distinct events; the twin
    # above dedups for the session STRUCTURE check, so compare structure
    # (bounds) and recount events per session directly
    got_struct = sorted({(u, st, en) for u, st, en, _ in got})
    want_struct = sorted({(u, st, en) for u, st, en, _ in want})
    assert got_struct == want_struct

    n_spark = sum(n for _, _, _, n in got)
    assert n_spark == len(rows)  # every event lands in exactly one session


def test_asof_join_fuzz_vs_duckdb_native_asof(spark):
    rng = random.Random(SEED + 1)
    left_rows, right_seen, right_rows = [], set(), []
    for i in range(500):
        left_rows.append((i, rng.randrange(10), _grid_ts(rng)))
    for _ in range(400):
        k, ts = rng.randrange(12), _grid_ts(rng)  # keys 10,11 never in left
        if (k, ts) in right_seen:
            continue
        right_seen.add((k, ts))
        v = None if rng.random() < 0.15 else round(rng.uniform(0, 100), 3)
        right_rows.append((k, ts, v))
    # keys 8,9 in left get a sparse/empty right side sometimes — ensure
    # at least one key with NO right rows at all
    right_rows = [r for r in right_rows if r[0] != 9]

    left = spark.createDataFrame(left_rows, "eid int, k int, ts timestamp")
    right = spark.createDataFrame(right_rows, "k int, ts timestamp, v double")
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="ts",
                    value_cols=["v"])
    got = sorted(((r.eid, r.ts_asof, r.v_asof) for r in out.collect()),
                 key=lambda t: t[0])

    con = duckdb.connect()
    con.execute("create table l (eid int, k int, ts timestamp)")
    con.executemany("insert into l values (?,?,?)", left_rows)
    con.execute("create table r (k int, ts timestamp, v double)")
    con.executemany("insert into r values (?,?,?)", right_rows)
    want = sorted((tuple(r) for r in con.execute("""
        select l.eid, r.ts, r.v
        from l asof left join r on l.k = r.k and l.ts >= r.ts
    """).fetchall()), key=lambda t: t[0])

    assert len(got) == len(left_rows) == len(want)
    assert got == want


def test_asof_join_forward_fuzz_vs_duckdb(spark):
    rng = random.Random(SEED + 2)
    left_rows = [(i, rng.randrange(8), _grid_ts(rng)) for i in range(300)]
    seen, right_rows = set(), []
    for _ in range(250):
        k, ts = rng.randrange(8), _grid_ts(rng)
        if (k, ts) in seen:
            continue
        seen.add((k, ts))
        right_rows.append((k, ts, round(rng.uniform(0, 9), 3)))

    left = spark.createDataFrame(left_rows, "eid int, k int, ts timestamp")
    right = spark.createDataFrame(right_rows, "k int, ts timestamp, v double")
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="ts",
                    value_cols=["v"], direction="forward")
    got = sorted(((r.eid, r.ts_asof, r.v_asof) for r in out.collect()),
                 key=lambda t: t[0])

    con = duckdb.connect()
    con.execute("create table l (eid int, k int, ts timestamp)")
    con.executemany("insert into l values (?,?,?)", left_rows)
    con.execute("create table r (k int, ts timestamp, v double)")
    con.executemany("insert into r values (?,?,?)", right_rows)
    want = sorted((tuple(r) for r in con.execute("""
        select l.eid, r.ts, r.v
        from l asof left join r on l.k = r.k and l.ts <= r.ts
    """).fetchall()), key=lambda t: t[0])
    assert got == want


def test_asof_join_tolerance_fuzz_vs_duckdb(spark):
    # tolerance = post-filter on the matched gap (pandas merge_asof
    # contract); DuckDB ASOF has no tolerance parameter, so the twin
    # NULLs matches farther than the interval in a post-projection —
    # a DIFFERENT mechanism than the engine's when()-guard over the
    # running-last struct. The 5-minute grid makes gaps land exactly ON
    # the tolerance bound constantly (<= must keep them).
    rng = random.Random(SEED + 3)
    tol_min = 15
    left_rows = [(i, rng.randrange(6), _grid_ts(rng)) for i in range(300)]
    seen, right_rows = set(), []
    for _ in range(200):
        k, ts = rng.randrange(6), _grid_ts(rng)
        if (k, ts) in seen:
            continue
        seen.add((k, ts))
        v = None if rng.random() < 0.15 else round(rng.uniform(0, 9), 3)
        right_rows.append((k, ts, v))

    left = spark.createDataFrame(left_rows, "eid int, k int, ts timestamp")
    right = spark.createDataFrame(right_rows, "k int, ts timestamp, v double")

    con = duckdb.connect()
    con.execute("create table l (eid int, k int, ts timestamp)")
    con.executemany("insert into l values (?,?,?)", left_rows)
    con.execute("create table r (k int, ts timestamp, v double)")
    con.executemany("insert into r values (?,?,?)", right_rows)

    for direction, cmp, gap in (
            ("backward", "l.ts >= r.ts", "l.ts - r.ts"),
            ("forward", "l.ts <= r.ts", "r.ts - l.ts")):
        out = asof_join(left, right, on="k", left_ts="ts", right_ts="ts",
                        value_cols=["v"], direction=direction,
                        tolerance=f"{tol_min} minutes")
        got = sorted(((r.eid, r.ts_asof, r.v_asof) for r in out.collect()),
                     key=lambda t: t[0])
        want = sorted((tuple(r) for r in con.execute(f"""
            select l.eid,
                   case when {gap} <= interval '{tol_min} minutes'
                        then r.ts end,
                   case when {gap} <= interval '{tol_min} minutes'
                        then r.v end
            from l asof left join r on l.k = r.k and {cmp}
        """).fetchall()), key=lambda t: t[0])
        assert got == want, direction
