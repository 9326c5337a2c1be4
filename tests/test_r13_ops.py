"""Round-13 optimization pins.

Every r13 change is a restructuring whose output must be bit-identical
to the shape it replaced; these tests pin the equivalences directly:

- the fused bidirectional block-pair pass (one grid, transpose reuse)
  vs the two cross_topm_layered calls it replaced in both ANN ingest
  folds;
- the batch-list semi-join prune on the blocked fold's reverse
  ivf_list_topm pass (the join discards unmatched lists anyway);
- the kafka epoch-produce checkpoint (epoch slicing values unchanged).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_1_19_source_spark.operators import graph_ann
from flink_1_19_source_spark.tables import load_table


def _nodes(spark, sf_dir, lo, hi):
    emb = load_table(spark, sf_dir, "embeddings").filter(
        (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
    )
    return graph_ann.with_levels(
        graph_ann.quantized(emb, "vec_id", "embedding")
    ).localCheckpoint(eager=True)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_bidir_pass_equals_two_directional_passes(spark, sf_dir):
    """cross_topm_layered_bidir(new, all+flag) must produce EXACTLY the
    union of cross_topm_layered(new, all) and
    cross_topm_layered(old, new): src sets are disjoint, so the fused
    global (lvl, src) window splits into the two per-direction windows
    the old code ran, and the per-pair kernels are byte-shared."""
    new = _nodes(spark, sf_dir, 0, 60)
    old = _nodes(spark, sf_dir, 60, 200)
    all_nodes = new.unionByName(old)

    ref = graph_ann.cross_topm_layered(new, all_nodes).unionByName(
        graph_ann.cross_topm_layered(old, new)
    )
    flagged = new.withColumn("is_new", F.lit(1)).unionByName(
        old.withColumn("is_new", F.lit(0))
    )
    got = graph_ann.cross_topm_layered_bidir(new, flagged)
    assert _rows(got) == _rows(ref)


def test_bidir_pass_first_batch_has_no_reverse_edges(spark, sf_dir):
    """With every row flagged new (the fold's first batch), the fused
    pass must equal the plain forward pass — no phantom old->new
    direction."""
    new = _nodes(spark, sf_dir, 0, 120)
    ref = graph_ann.cross_topm_layered(new, new)
    got = graph_ann.cross_topm_layered_bidir(
        new, new.withColumn("is_new", F.lit(1))
    )
    assert _rows(got) == _rows(ref)


def test_blocked_reverse_pass_list_prune_is_invisible(spark, sf_dir):
    """The blocked fold prunes the reverse pass's exploded index side to
    lists the batch landed in (semi-join on the batch's corpus lists)
    BEFORE packing; the list_id equi-join discards those rows anyway, so
    the per-src top-m must not move."""
    from flink_1_19_source_spark.queries.llm_graph_ann import (
        _NPROBE_BLOCKED,
        _fixture_codebook,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cent = _fixture_codebook(emb)
    new = graph_ann.ivf_assigned_quantized(
        emb.filter(F.col("vec_id") < 50), cent, _NPROBE_BLOCKED
    ).localCheckpoint(eager=True)
    old = graph_ann.ivf_assigned_quantized(
        emb.filter((F.col("vec_id") >= 50) & (F.col("vec_id") < 220)),
        cent, _NPROBE_BLOCKED,
    ).localCheckpoint(eager=True)

    def as_src(nodes):
        return nodes.select(
            "vec_id", "qv", "nq", F.explode("ls_p").alias("list_id")
        )

    def as_dst(nodes):
        return nodes.select(
            "vec_id", "qv", "nq", F.col("list_c").alias("list_id")
        )

    ref = graph_ann.ivf_list_topm(as_src(old), as_dst(new), 5)
    batch_lists = new.select(F.col("list_c").alias("list_id")).distinct()
    pruned = as_src(old).join(
        F.broadcast(batch_lists), "list_id", "left_semi"
    )
    got = graph_ann.ivf_list_topm(pruned, as_dst(new), 5)
    # per-pair candidates may arrive in different pack order; compare
    # the finished per-src top-m selection both callers apply
    from pyspark.sql.window import Window

    def topm(df):
        w = Window.partitionBy("src").orderBy(
            F.col("cosine_sim").desc(), F.col("dst")
        )
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 5)
            .drop("rn")
        )

    assert _rows(topm(got)) == _rows(topm(ref))


def test_ivf_list_topm_bidir_equals_two_calls(spark, sf_dir):
    """The fused layer-0 kernel (one packed list join, two exact block
    products per pair) must select EXACTLY what the two ivf_list_topm
    calls selected once the caller's per-src top-m window runs — the
    sub-block composition differs (the src union packs together), but
    per-(sub)pair top-m is a safe reduction for any blocking."""
    from pyspark.sql.window import Window

    from flink_1_19_source_spark.queries.llm_graph_ann import (
        _NPROBE_BLOCKED,
        _fixture_codebook,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cent = _fixture_codebook(emb)
    new = graph_ann.ivf_assigned_quantized(
        emb.filter(F.col("vec_id") < 70), cent, _NPROBE_BLOCKED
    ).localCheckpoint(eager=True)
    old = graph_ann.ivf_assigned_quantized(
        emb.filter((F.col("vec_id") >= 70) & (F.col("vec_id") < 260)),
        cent, _NPROBE_BLOCKED,
    ).localCheckpoint(eager=True)

    def as_src(nodes):
        return nodes.select(
            "vec_id", "qv", "nq", F.explode("ls_p").alias("list_id")
        )

    def as_dst(nodes):
        return nodes.select(
            "vec_id", "qv", "nq", F.col("list_c").alias("list_id")
        )

    all_dst = as_dst(new).unionByName(as_dst(old))
    ref = graph_ann.ivf_list_topm(as_src(new), all_dst, 5).unionByName(
        graph_ann.ivf_list_topm(as_src(old), as_dst(new), 5)
    )
    flagged = as_dst(new).withColumn("is_new", F.lit(1)).unionByName(
        as_dst(old).withColumn("is_new", F.lit(0))
    )
    got = graph_ann.ivf_list_topm_bidir(
        as_src(new), as_src(old), flagged, 5
    )

    def topm(df):
        w = Window.partitionBy("src").orderBy(
            F.col("cosine_sim").desc(), F.col("dst")
        )
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 5)
            .drop("rn")
        )

    assert _rows(topm(got)) == _rows(topm(ref))


def test_dsir_scored_tokenize_once_equals_token_row_form(spark, sf_dir):
    """The doc x bucket counted form must score bit-identically to the
    token-row form it replaced: Σ_tokens w(b) = Σ_b w(b)·cnt(doc,b),
    exact int64, and n_tokens = Σ cnt."""
    from flink_1_19_source_spark.queries.llm_dsir import (
        _dsir_bt,
        _dsir_bucket_stats,
        _dsir_score_with_stats,
        _dsir_scored,
    )

    d = load_table(spark, sf_dir, "documents")
    got = _rows(_dsir_scored(d).select(
        "doc_id", "lang", "score", "n_tokens"
    ))
    bt = _dsir_bt(d)
    ref = _rows(
        _dsir_score_with_stats(bt, _dsir_bucket_stats(bt).collect())
        .select("doc_id", "lang", "score", "n_tokens")
    )
    assert got == ref


def test_winnow_arrays_equals_window_form(spark, sf_dir):
    """The zero-shuffle array form of winnow_fingerprints must emit
    EXACTLY the (id, pos, fp) rows of the explode→Exchange→Sort→sliding
    window-min form it replaced — including the short-document edge
    (docs with fewer than w grams emit nothing in both forms)."""
    from pyspark.sql.window import Window

    from flink_1_19_source_spark.operators import text_analysis as ta

    k, w = 8, 16
    d = load_table(spark, sf_dir, "documents")
    # planted edge docs: shorter than k, between k and w+k-1, exactly
    # the minimum full-window length
    extra = spark.createDataFrame(
        [
            (900001, "tiny"),
            (900002, "x" * (k + 3)),
            (900003, "abcdefgh" * 3),  # n = 17 grams >= w: one+ window
        ],
        "doc_id long, text string",
    )
    src = d.select("doc_id", "text").unionByName(extra)

    def reference(df):
        t = F.lower(F.col("text"))
        n_grams = F.greatest(F.length(t) - F.lit(k - 1), F.lit(1))
        pos = df.select(
            F.col("doc_id").alias("id"), t.alias("t"),
            n_grams.alias("n"),
            F.explode(F.sequence(F.lit(1), n_grams)).alias("pos"),
        )
        h = pos.select(
            "id", "pos", "n",
            F.conv(
                F.substring(
                    F.md5(F.substring(F.col("t"), F.col("pos"), k)), 1, 8
                ), 16, 10,
            ).cast("long").alias("h"),
        )
        win = Window.partitionBy("id").orderBy("pos").rowsBetween(0, w - 1)
        return (
            h.withColumn("fp", F.min("h").over(win))
            .filter(F.col("pos") <= F.col("n") - F.lit(w - 1))
            .select("id", "pos", "fp")
        )

    got = _rows(ta.winnow_fingerprints(src, "doc_id", "text", k=k, w=w))
    ref = _rows(reference(src))
    assert got == ref


def test_kafka_epoch_slicing_unchanged_by_checkpoint(spark, sf_dir):
    """The epoch-produce checkpoint must not move a single row between
    epochs: the __epoch assignment over the checkpointed ranked frame
    must equal the closed-form NTILE bucketing over a plain global
    row_number (the (ts, event_id) order is unique, so the dense rank
    IS the row number)."""
    from pyspark.sql.window import Window

    from flink_1_19_source_spark.operators.suffix_array import (
        dense_rank_distributed,
    )

    e = load_table(spark, sf_dir, "events")
    epochs = 4
    n = e.count()
    q, r = divmod(n, epochs)
    rn = F.col("__rn")
    epoch_col = (
        F.when(rn <= r * (q + 1), F.ceil(rn / (q + 1)))
        .otherwise(r + F.ceil((rn - r * (q + 1)) / F.lit(q)))
        .cast("int")
    )
    got = (
        dense_rank_distributed(e, ["ts", "event_id"], "__rn")
        .withColumn("__epoch", epoch_col)
        .localCheckpoint(eager=True)
    )
    ref = e.withColumn(
        "__rn",
        F.row_number().over(Window.orderBy("ts", "event_id")).cast("long"),
    ).withColumn("__epoch", epoch_col)
    diff = (
        got.select("event_id", "__epoch")
        .join(
            ref.select("event_id", F.col("__epoch").alias("__epoch_ref")),
            "event_id",
        )
        .filter(F.col("__epoch") != F.col("__epoch_ref"))
        .count()
    )
    assert diff == 0
    # and the per-epoch sizes are the NTILE contract: r buckets of q+1,
    # the rest of q
    sizes = {
        row["__epoch"]: row["cnt"]
        for row in got.groupBy("__epoch")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    expect = {ep: (q + 1 if ep <= r else q) for ep in range(1, epochs + 1)}
    assert sizes == expect
