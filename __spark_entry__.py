"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship compiled-spec validation on sf0.001.
``queries()`` exposes one entry per implemented operator family from
SURVEY.md §2 (+ the training-data pipeline operators); ``oracle_sql()``
gives the DuckDB twin for every SQL-expressible one. Column names/types are
aligned on both sides; double aggregates go through exact decimal sums or
rounding so value hashes are deterministic.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ORDERS_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
               "o_orderdate", "o_orderpriority"]

FLAGSHIP_LINEITEM_SPEC = {
    "$schema": "http://json-schema.org/draft-07/schema#",
    "type": "object",
    "required": ["l_orderkey", "l_quantity", "l_returnflag"],
    "properties": {
        "l_quantity": {"type": "number", "minimum": 1, "maximum": 45},
        "l_discount": {"type": "number", "minimum": 0, "exclusiveMaximum": 0.09},
        "l_returnflag": {"enum": ["A", "N", "R"]},
        "l_linenumber": {"type": "integer", "minimum": 1, "maximum": 7,
                         "format": "int32"},
        "l_extendedprice": {"type": "number", "exclusiveMinimum": 0},
    },
}


def _t(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: compile the constraint spec once, emit violation rows for
    sf0.001 lineitem plus referential-orphan violations vs orders."""
    from sparkschema.compiler.table import compile_table_spec
    from sparkschema.operators.referential import orphan_violations

    sf = "/root/testdata/sf0.001"
    li = spark.read.parquet(_t(sf, "lineitem"))
    orders = spark.read.parquet(_t(sf, "orders"))
    cts = compile_table_spec(FLAGSHIP_LINEITEM_SPEC, li,
                             key_cols=["l_orderkey", "l_linenumber"])
    row_viols = cts.violations(li)
    ref_viols = orphan_violations(
        li, "l_orderkey", orders, "o_orderkey",
        key_cols=["l_orderkey", "l_linenumber"], ref_name="orders",
        strategy="broadcast"
    ).select(F.col("l_orderkey").cast("string"),
             F.col("l_linenumber").cast("string"),
             "keyword", "schema_path", "instance_path", "value", "msg")
    return row_viols.unionByName(ref_viols)


# ---------------------------------------------------------------------------
# queries


def _q_null_fraction_orders(spark, sf):
    o = spark.read.parquet(_t(sf, "orders"))
    aggs = [F.count(F.lit(1)).alias("total_rows")]
    for c in ORDERS_COLS:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}"))
    return o.agg(*aggs)


def _q_minmax_lineitem(spark, sf):
    li = spark.read.parquet(_t(sf, "lineitem"))
    return (li.groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias("cnt"),
                 F.min("l_quantity").alias("min_qty"),
                 F.max("l_quantity").alias("max_qty"),
                 F.sum(F.col("l_quantity").cast("decimal(18,4)"))
                  .cast("double").alias("sum_qty")))


def _q_enum_violations_lineitem(spark, sf):
    li = spark.read.parquet(_t(sf, "lineitem"))
    return li.agg(
        F.count(F.lit(1)).alias("total_rows"),
        F.sum((~F.col("l_returnflag").isin("A", "N", "R")).cast("long"))
         .alias("enum_violations"),
        F.sum((~F.col("l_linestatus").isin("O", "F")).cast("long"))
         .alias("status_violations"))


def _q_pattern_match_customer(spark, sf):
    c = spark.read.parquet(_t(sf, "customer"))
    pat = "^Customer#[0-9]{9}$"
    # phone_prefix stays a constant 0 on BOTH sides: the oracle hardcodes it,
    # and a data-dependent Spark branch would silently diverge if the dataset
    # ever gained a c_phone column (ADVICE r1).
    return c.agg(
        F.count(F.lit(1)).alias("total_rows"),
        F.sum(F.col("c_name").rlike(pat).cast("long")).alias("matched"),
        F.lit(0).cast("long").alias("phone_prefix"))


def _q_range_violations_lineitem(spark, sf):
    from sparkschema.compiler.table import compile_table_spec

    li = spark.read.parquet(_t(sf, "lineitem"))
    cts = compile_table_spec(FLAGSHIP_LINEITEM_SPEC, li,
                             key_cols=["l_orderkey", "l_linenumber"])
    return cts.violations(li).select(
        "l_orderkey", "l_linenumber", "keyword", "instance_path", "value")


def _q_referential_orphans(spark, sf):
    from sparkschema.operators.referential import orphans

    li = spark.read.parquet(_t(sf, "lineitem"))
    o = spark.read.parquet(_t(sf, "orders"))
    c = spark.read.parquet(_t(sf, "customer"))
    r1 = orphans(li, "l_orderkey", o, "o_orderkey", strategy="broadcast").count()
    r2 = orphans(o, "o_custkey", c, "c_custkey", strategy="broadcast").count()
    return spark.createDataFrame(
        [(int(r1), int(r2))], "lineitem_orphans bigint, order_orphans bigint")


def _q_histogram_extendedprice(spark, sf):
    from sparkschema.operators.stats import histogram

    li = spark.read.parquet(_t(sf, "lineitem"))
    h = histogram(li, "l_extendedprice", 0.0, 60000.0, 6)
    return h.select(F.col("bucket").cast("int").alias("bucket"),
                    F.col("cnt").cast("long").alias("cnt"))


def _q_combinator_part(spark, sf):
    from sparkschema.compiler.table import compile_table_spec

    p = spark.read.parquet(_t(sf, "part"))
    spec = {
        "type": "object",
        "properties": {"p_size": {"type": "integer", "minimum": 1}},
        "oneOf": [
            {"properties": {"p_size": {"maximum": 9}}},
            {"properties": {"p_retailprice": {"minimum": 1500.0}}},
        ],
        "not": {"properties": {"p_brand": {"const": "Brand#99"}}},
    }
    cts = compile_table_spec(spec, p, key_cols=["p_partkey"])
    v = cts.violations(p)
    return (v.groupBy("keyword").agg(F.count(F.lit(1)).alias("cnt"))
             .orderBy("keyword"))


def _q_duplicate_orderkeys(spark, sf):
    from sparkschema.operators.uniqueness import duplicate_keys

    li = spark.read.parquet(_t(sf, "lineitem"))
    return duplicate_keys(li, "l_orderkey").select(
        "l_orderkey", F.col("dup_count").cast("long").alias("dup_count"))


def _q_unique_composite_lineitem(spark, sf):
    from sparkschema.operators.uniqueness import duplicate_keys

    li = spark.read.parquet(_t(sf, "lineitem"))
    d = duplicate_keys(li, ["l_orderkey", "l_linenumber"])
    return d.agg(F.count(F.lit(1)).alias("dup_key_count"))


def _q_exact_dup_documents(spark, sf):
    from sparkschema.operators.dedup import exact_duplicate_groups

    d = spark.read.parquet(_t(sf, "documents"))
    g = exact_duplicate_groups(d, "text", "doc_id")
    return g.select("content_hash",
                    F.col("group_size").cast("long").alias("group_size"),
                    F.array_min("ids").alias("min_id"),
                    F.array_max("ids").alias("max_id"))


def _q_token_stats_documents(spark, sf):
    from sparkschema.operators.text import token_count, whitespace_token_count

    d = spark.read.parquet(_t(sf, "documents"))
    return d.select(
        "doc_id",
        token_count(F.col("text")).cast("long").alias("n_tokens"),
        whitespace_token_count(F.col("text")).cast("long").alias("n_ws_tokens"),
        F.length("text").cast("long").alias("n_chars_engine"))


def _q_lang_counts_documents(spark, sf):
    from sparkschema.operators.text import lang_id

    d = spark.read.parquet(_t(sf, "documents"))
    return (d.select(lang_id(F.col("text")).alias("lang"))
             .groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")))


def _q_quality_components_documents(spark, sf):
    from sparkschema.operators.text import quality_features

    d = spark.read.parquet(_t(sf, "documents"))
    f = quality_features(F.col("text"))
    return d.select(
        "doc_id",
        f["n_chars"].cast("long").alias("n_chars_q"),
        f["n_tokens"].cast("long").alias("n_tokens_q"),
        f["n_words"].cast("long").alias("n_words_q"),
        F.round(f["punct_ratio"], 4).alias("punct_ratio"),
        f["stopword_hits"].cast("long").alias("stopword_hits"))


def _q_fingerprint_documents(spark, sf):
    from sparkschema.operators.dedup import normalized_text

    d = spark.read.parquet(_t(sf, "documents"))
    return d.select("doc_id", F.md5(normalized_text(F.col("text"))).alias("fp_md5"))


def _q_events_hourly(spark, sf):
    e = spark.read.parquet(_t(sf, "events"))
    return (e.groupBy(F.date_format(F.date_trunc("hour", "ts"),
                                    "yyyy-MM-dd HH:mm:ss").alias("hour"),
                      "event_type")
             .agg(F.count(F.lit(1)).alias("cnt"),
                  F.sum(F.col("value").cast("decimal(18,4)"))
                   .cast("double").alias("sum_value")))


def _q_events_json_invalid(spark, sf):
    # VARIANT-native dynamic-JSON path (Catalyst expressions, no Python);
    # json_valid_auto falls back to the Arrow kernel for unbounded specs
    from sparkschema.compiler.variantcol import json_valid_auto

    e = spark.read.parquet(_t(sf, "events"))
    spec = {"type": "object", "required": ["k"],
            "properties": {"k": {"type": "integer", "minimum": 0, "maximum": 50}}}
    ok = json_valid_auto("props", spec)
    return e.agg(F.count(F.lit(1)).alias("total_rows"),
                 F.sum((~F.coalesce(ok, F.lit(False))).cast("long"))
                  .alias("invalid_rows"))


def _q_embedding_topk(spark, sf):
    from sparkschema.operators.similarity import cosine_topk_bruteforce

    emb = spark.read.parquet(_t(sf, "embeddings")).withColumn(
        "embedding", F.col("embedding").cast("array<double>"))
    q = emb.where(F.col("vec_id") < 5)
    top = cosine_topk_bruteforce(q, emb, "vec_id", "embedding",
                                 "vec_id", "embedding", k=3)
    return top.select("query_id", "neighbor_id",
                      F.round("cosine", 4).alias("cosine_r"))


def _q_ngram_jaccard_sample(spark, sf):
    from sparkschema.operators.dedup import ngram_jaccard

    d = spark.read.parquet(_t(sf, "documents")).where(F.col("doc_id") < 12) \
             .select("doc_id", "text")
    a = d.select(F.col("doc_id").alias("id_a"), F.col("text").alias("ta"))
    b = d.select(F.col("doc_id").alias("id_b"), F.col("text").alias("tb"))
    pairs = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    return pairs.select(
        "id_a", "id_b",
        F.round(ngram_jaccard(F.col("ta"), F.col("tb"), 3), 4).alias("jaccard_r"))


def _q_drift_ks_lineitem(spark, sf):
    from sparkschema.operators.drift import ks_histograms
    from sparkschema.operators.stats import histogram

    li = spark.read.parquet(_t(sf, "lineitem"))
    a = li.where(F.col("l_orderkey") % 2 == 0)
    b = li.where(F.col("l_orderkey") % 2 == 1)
    ha = histogram(a, "l_extendedprice", 0.0, 60000.0, 24)
    hb = histogram(b, "l_extendedprice", 0.0, 60000.0, 24)
    return ks_histograms(ha, hb).select(F.round("statistic", 6).alias("ks"))


def _q_stats_lineitem(spark, sf):
    from sparkschema.operators.stats import column_stats

    li = spark.read.parquet(_t(sf, "lineitem"))
    s = column_stats(li, ["l_quantity", "l_extendedprice", "l_returnflag"])
    return s.select("column", F.col("rows").cast("long").alias("rows_total"),
                    F.col("null_count").cast("long").alias("null_count"),
                    F.col("min").alias("min_str"), F.col("max").alias("max_str"))


def _q_minhash_pairs_documents(spark, sf):
    """Near-dup pairs (rows-only check: xxhash64 minhash has no SQL twin;
    golden coverage lives in tests/test_pipeline_operators.py)."""
    from sparkschema.operators.dedup import minhash_lsh_pairs

    d = spark.read.parquet(_t(sf, "documents"))
    return minhash_lsh_pairs(d, "text", "doc_id", num_hashes=48, bands=12,
                             jaccard_min=0.6)


def _q_simhash_documents(spark, sf):
    """SimHash signatures (rows-only: xxhash64-based)."""
    from sparkschema.operators.dedup import simhash_frame

    d = spark.read.parquet(_t(sf, "documents"))
    return simhash_frame(d, "text", "doc_id").withColumnRenamed("id", "doc_id")


def _q_hll_distinct_lineitem(spark, sf):
    """Sketch-merged distinct estimate (rows-only: approximate)."""
    from sparkschema.operators.stats import hll_distinct_sketches, hll_merge

    li = spark.read.parquet(_t(sf, "lineitem"))
    return hll_merge(hll_distinct_sketches(li, "l_orderkey")) \
        .select(F.col("distinct_estimate").cast("long").alias("estimate"),
                F.col("rows").cast("long").alias("rows_total"))


def _q_ann_lsh_embeddings(spark, sf):
    """LSH ANN over embeddings (rows-only: approximate by design)."""
    from sparkschema.operators.similarity import ann_lsh_topk

    emb = spark.read.parquet(_t(sf, "embeddings")).withColumn(
        "embedding", F.col("embedding").cast("array<double>"))
    q = emb.where(F.col("vec_id") < 3)
    return ann_lsh_topk(q, emb, "vec_id", "embedding", "vec_id", "embedding",
                        k=5, planes=4, tables=8)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "null_fraction_orders": _q_null_fraction_orders,
        "minmax_lineitem": _q_minmax_lineitem,
        "enum_violations_lineitem": _q_enum_violations_lineitem,
        "pattern_match_customer": _q_pattern_match_customer,
        "range_violations_lineitem": _q_range_violations_lineitem,
        "referential_orphans": _q_referential_orphans,
        "histogram_extendedprice": _q_histogram_extendedprice,
        "combinator_part": _q_combinator_part,
        "duplicate_orderkeys": _q_duplicate_orderkeys,
        "unique_composite_lineitem": _q_unique_composite_lineitem,
        "exact_dup_documents": _q_exact_dup_documents,
        "token_stats_documents": _q_token_stats_documents,
        "lang_counts_documents": _q_lang_counts_documents,
        "quality_components_documents": _q_quality_components_documents,
        "fingerprint_documents": _q_fingerprint_documents,
        "events_hourly": _q_events_hourly,
        "events_json_invalid": _q_events_json_invalid,
        "embedding_topk": _q_embedding_topk,
        "ngram_jaccard_sample": _q_ngram_jaccard_sample,
        "drift_ks_lineitem": _q_drift_ks_lineitem,
        "stats_lineitem": _q_stats_lineitem,
        # rows-only (approximate / hash-based, no ANSI twin):
        "minhash_pairs_documents": _q_minhash_pairs_documents,
        "simhash_documents": _q_simhash_documents,
        "hll_distinct_lineitem": _q_hll_distinct_lineitem,
        "ann_lsh_embeddings": _q_ann_lsh_embeddings,
    }


# ---------------------------------------------------------------------------
# oracles (DuckDB; same column names; views pre-registered by the driver)

_NORM = "trim(regexp_replace(lower({c}), '\\s+', ' ', 'g'))"
_TOKRE = "[A-Za-z0-9]+|[^A-Za-z0-9 \\t\\n\\r]"


def _sql_null_fraction_orders() -> str:
    nulls = ", ".join(
        f"cast(sum(case when {c} is null then 1 else 0 end) as bigint) as nulls_{c}"
        for c in ORDERS_COLS)
    return f"select cast(count(*) as bigint) as total_rows, {nulls} from orders"


def _sql_range_violations() -> str:
    k = ("cast(l_orderkey as varchar) as l_orderkey, "
         "cast(l_linenumber as varchar) as l_linenumber")
    parts = [
        f"""select {k}, 'maximum' as keyword, '/l_quantity' as instance_path,
               cast(l_quantity as varchar) as value
            from lineitem where l_quantity > 45""",
        f"""select {k}, 'exclusiveMaximum' as keyword, '/l_discount' as instance_path,
               cast(l_discount as varchar) as value
            from lineitem where l_discount >= 0.09""",
        f"""select {k}, 'minimum' as keyword, '/l_quantity' as instance_path,
               cast(l_quantity as varchar) as value
            from lineitem where l_quantity < 1""",
        f"""select {k}, 'minimum' as keyword, '/l_discount' as instance_path,
               cast(l_discount as varchar) as value
            from lineitem where l_discount < 0""",
        f"""select {k}, 'enum' as keyword, '/l_returnflag' as instance_path,
               l_returnflag as value
            from lineitem where l_returnflag not in ('A','N','R')""",
        f"""select {k}, 'minimum' as keyword, '/l_linenumber' as instance_path,
               cast(l_linenumber as varchar) as value
            from lineitem where l_linenumber < 1""",
        f"""select {k}, 'maximum' as keyword, '/l_linenumber' as instance_path,
               cast(l_linenumber as varchar) as value
            from lineitem where l_linenumber > 7""",
        f"""select {k}, 'format' as keyword, '/l_linenumber' as instance_path,
               cast(l_linenumber as varchar) as value
            from lineitem
            where l_linenumber < -2147483648 or l_linenumber > 2147483647""",
        f"""select {k}, 'exclusiveMinimum' as keyword,
               '/l_extendedprice' as instance_path,
               cast(l_extendedprice as varchar) as value
            from lineitem where l_extendedprice <= 0""",
        f"""select {k}, 'required' as keyword, '/l_orderkey' as instance_path,
               'null' as value from lineitem where l_orderkey is null""",
        f"""select {k}, 'required' as keyword, '/l_quantity' as instance_path,
               'null' as value from lineitem where l_quantity is null""",
        f"""select {k}, 'required' as keyword, '/l_returnflag' as instance_path,
               'null' as value from lineitem where l_returnflag is null""",
    ]
    return " union all ".join(parts)


def oracle_sql() -> dict[str, str]:
    norm_text = _NORM.format(c="text")
    return {
        "null_fraction_orders": _sql_null_fraction_orders(),
        "minmax_lineitem": """
            select l_returnflag,
                   cast(count(*) as bigint) as cnt,
                   min(l_quantity) as min_qty,
                   max(l_quantity) as max_qty,
                   cast(sum(cast(l_quantity as decimal(18,4))) as double) as sum_qty
            from lineitem group by l_returnflag
        """,
        "enum_violations_lineitem": """
            select cast(count(*) as bigint) as total_rows,
                   cast(sum(case when l_returnflag not in ('A','N','R')
                            then 1 else 0 end) as bigint) as enum_violations,
                   cast(sum(case when l_linestatus not in ('O','F')
                            then 1 else 0 end) as bigint) as status_violations
            from lineitem
        """,
        "pattern_match_customer": """
            select cast(count(*) as bigint) as total_rows,
                   cast(sum(case when regexp_matches(c_name, '^Customer#[0-9]{9}$')
                            then 1 else 0 end) as bigint) as matched,
                   cast(0 as bigint) as phone_prefix
            from customer
        """,
        "range_violations_lineitem": _sql_range_violations(),
        "referential_orphans": """
            select cast((select count(*) from lineitem
                         where l_orderkey is not null and l_orderkey not in
                           (select o_orderkey from orders where o_orderkey is not null))
                        as bigint) as lineitem_orphans,
                   cast((select count(*) from orders
                         where o_custkey is not null and o_custkey not in
                           (select c_custkey from customer where c_custkey is not null))
                        as bigint) as order_orphans
        """,
        "histogram_extendedprice": """
            select cast(case when l_extendedprice < 0 then 0
                        when l_extendedprice >= 60000 then 7
                        else cast(floor(l_extendedprice / 10000) as int) + 1 end as int)
                     as bucket,
                   cast(count(*) as bigint) as cnt
            from lineitem where l_extendedprice is not null
            group by 1
        """,
        "combinator_part": """
            with flags as (
              select case when p_size <= 9 then 1 else 0 end
                     + case when p_retailprice >= 1500.0 then 1 else 0 end as matches,
                     case when p_brand = 'Brand#99' then 1 else 0 end as is99,
                     case when p_size < 1 then 1 else 0 end as small
              from part)
            select keyword, cast(cnt as bigint) as cnt from (
              select 'oneOf' as keyword, count(*) as cnt from flags where matches <> 1
              union all
              select 'not' as keyword, count(*) as cnt from flags where is99 = 1
              union all
              select 'minimum' as keyword, count(*) as cnt from flags where small = 1
            ) where cnt > 0 order by keyword
        """,
        "duplicate_orderkeys": """
            select l_orderkey, cast(count(*) as bigint) as dup_count
            from lineitem group by l_orderkey having count(*) > 1
        """,
        "unique_composite_lineitem": """
            select cast(count(*) as bigint) as dup_key_count from (
              select l_orderkey, l_linenumber from lineitem
              group by 1, 2 having count(*) > 1)
        """,
        "exact_dup_documents": f"""
            select sha256({norm_text}) as content_hash,
                   cast(count(*) as bigint) as group_size,
                   min(doc_id) as min_id, max(doc_id) as max_id
            from documents group by 1 having count(*) > 1
        """,
        "token_stats_documents": f"""
            select doc_id,
                   cast(len(regexp_extract_all(text, '{_TOKRE}')) as bigint)
                     as n_tokens,
                   cast(case when trim(text) = '' then 0
                        else len(regexp_split_to_array(trim(text), '\\s+')) end
                        as bigint) as n_ws_tokens,
                   cast(length(text) as bigint) as n_chars_engine
            from documents
        """,
        "lang_counts_documents": f"""
            with ws as (
              select doc_id,
                     list_distinct(string_split({norm_text}, ' ')) as w
              from documents),
            scores as (
              select doc_id,
                w, len(list_intersect(w, ['der','die','und','das','ist','von','mit','den','nicht','ein'])) as s_de,
                len(list_intersect(w, ['the','and','of','to','in','is','that','it','was','for'])) as s_en,
                len(list_intersect(w, ['de','la','que','el','en','los','del','las','por','un'])) as s_es,
                len(list_intersect(w, ['le','la','les','des','est','dans','que','une','pour','qui'])) as s_fr
              from ws),
            lang as (
              select case
                when greatest(s_de, s_en, s_es, s_fr) = 0 then 'und'
                when s_de = greatest(s_de, s_en, s_es, s_fr) then 'de'
                when s_en = greatest(s_de, s_en, s_es, s_fr) then 'en'
                when s_es = greatest(s_de, s_en, s_es, s_fr) then 'es'
                else 'fr' end as lang
              from scores)
            select lang, cast(count(*) as bigint) as cnt from lang group by lang
        """,
        "quality_components_documents": f"""
            with toks as (
              select doc_id, length(text) as n_chars,
                     regexp_extract_all(text, '{_TOKRE}') as t,
                     list_distinct(string_split({norm_text}, ' ')) as w
              from documents)
            select doc_id,
                   cast(n_chars as bigint) as n_chars_q,
                   cast(len(t) as bigint) as n_tokens_q,
                   cast(len(list_filter(t, x -> regexp_matches(x, '^[A-Za-z0-9]+$')))
                        as bigint) as n_words_q,
                   round(case when len(t) > 0 then
                     (len(t) - len(list_filter(t, x -> regexp_matches(x, '^[A-Za-z0-9]+$'))))
                     / cast(len(t) as double) else 0.0 end, 4) as punct_ratio,
                   cast(len(list_intersect(w,
                     ['the','and','of','to','in','is','that','it','was','for']))
                     as bigint) as stopword_hits
            from toks
        """,
        "fingerprint_documents": f"""
            select doc_id, md5({norm_text}) as fp_md5 from documents
        """,
        "events_hourly": """
            select strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') as hour,
                   event_type,
                   cast(count(*) as bigint) as cnt,
                   cast(sum(cast(value as decimal(18,4))) as double) as sum_value
            from events group by 1, 2
        """,
        "events_json_invalid": """
            select cast(count(*) as bigint) as total_rows,
                   cast(sum(case when k is null or k < 0 or k > 50
                            then 1 else 0 end) as bigint) as invalid_rows
            from (select try_cast(json_extract_string(props, '$.k') as bigint) as k
                  from events)
        """,
        "embedding_topk": """
            select q.vec_id as query_id, c.vec_id as neighbor_id,
                   round(list_cosine_similarity(
                     cast(q.embedding as double[]),
                     cast(c.embedding as double[])), 4) as cosine_r
            from embeddings q cross join embeddings c
            where q.vec_id < 5
            qualify row_number() over (
              partition by q.vec_id
              order by list_cosine_similarity(cast(q.embedding as double[]),
                                              cast(c.embedding as double[])) desc,
                       c.vec_id asc) <= 3
        """,
        "ngram_jaccard_sample": f"""
            with d as (select doc_id, {norm_text} as nt from documents
                       where doc_id < 12),
            sh as (select doc_id,
                     case when length(nt) < 3 then [nt]
                          else list_distinct(list_transform(
                            range(1, length(nt) - 1),
                            i -> substring(nt, i, 3))) end as s
                   from d)
            select a.doc_id as id_a, b.doc_id as id_b,
                   round(len(list_intersect(a.s, b.s)) /
                     greatest(cast(len(a.s) + len(b.s)
                              - len(list_intersect(a.s, b.s)) as double), 1.0), 4)
                     as jaccard_r
            from sh a cross join sh b where a.doc_id < b.doc_id
        """,
        "drift_ks_lineitem": """
            with h as (
              select case when l_extendedprice < 0 then 0
                          when l_extendedprice >= 60000 then 25
                          else cast(floor(l_extendedprice / 2500) as int) + 1 end
                       as bucket,
                     sum(case when l_orderkey % 2 = 0 then 1 else 0 end) as o,
                     sum(case when l_orderkey % 2 = 1 then 1 else 0 end) as e
              from lineitem where l_extendedprice is not null group by 1),
            c as (
              select bucket,
                     sum(o) over (order by bucket) / cast(sum(o) over () as double)
                       as cdf_o,
                     sum(e) over (order by bucket) / cast(sum(e) over () as double)
                       as cdf_e
              from h)
            select round(max(abs(cdf_o - cdf_e)), 6) as ks from c
        """,
        "stats_lineitem": """
            select c.column, cast(c.rows_total as bigint) as rows_total,
                   cast(c.null_count as bigint) as null_count,
                   c.min_str, c.max_str
            from (
              select 'l_quantity' as "column", count(*) as rows_total,
                     sum(case when l_quantity is null then 1 else 0 end) as null_count,
                     cast(min(l_quantity) as varchar) as min_str,
                     cast(max(l_quantity) as varchar) as max_str
              from lineitem
              union all
              select 'l_extendedprice', count(*),
                     sum(case when l_extendedprice is null then 1 else 0 end),
                     cast(min(l_extendedprice) as varchar),
                     cast(max(l_extendedprice) as varchar)
              from lineitem
              union all
              select 'l_returnflag', count(*),
                     sum(case when l_returnflag is null then 1 else 0 end),
                     min(l_returnflag), max(l_returnflag)
              from lineitem
            ) c
        """,
    }
