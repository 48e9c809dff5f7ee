#!/usr/bin/env python3
"""Round-3 soak: scale the NEW operator families on replicated sf0.1 inputs.

Jobs (local[$SPARK_GRAFT_CPUS], default 32; distinct ids per replica):
  - repeated_spans: positional 4-gram duplication spans over replicated docs.
    Replication makes EVERY gram cross-doc-duplicated (df >= repl), so the
    hits table degenerates to the full positional-gram table — the worst
    case for the island-merge window, on purpose.
  - cms_heavy: Count-Min heavy hitters over the replicated bigram stream
    (threshold scales with repl so the output set is comparable).
  - bloom_pass: Bloom decontamination pre-pass, eval = doc_id % 10 == 0 of
    the replicated corpus.
  - pq_encode: train codebooks ONCE on the base corpus (the documented
    sample-then-encode contract), then the map-only encode pass over
    replicated embeddings — the pass that runs over 100 TB.
  - triangles: customer/nation/region graph with replicated customers:
    hub degrees grow linearly with repl, triangle count = repl × customers
    — the degree-orientation stress test.

Prints one JSON line per job with per-rep wall times (trust the min;
CLAUDE.md: this host's absolute times drift).

Usage: python scripts/soak_r3.py [repl] [reps] [job ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    repl = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from pyspark.sql import functions as F

    from chronographer_spark.operators.dedup import repeated_ngram_spans
    from chronographer_spark.operators.graph_algos import triangle_count
    from chronographer_spark.operators.pq import pq_encode, train_pq_codebooks
    from chronographer_spark.operators.sketches import (
        bloom_build,
        bloom_maybe_contains,
        cms_heavy_hitters,
    )
    from chronographer_spark.session import get_spark

    spark = get_spark(
        app_name=f"soak-r3-{repl}x",
        master=f"local[{CPUS}]",
        shuffle_partitions=4 * CPUS,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()
    docs_r = (
        docs.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(repl - 1))))
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * (10 * n_docs))
        .drop("rep")
        .repartition(4 * CPUS)
        .localCheckpoint(eager=True)
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n_emb = emb.count()
    emb_r = (
        emb.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(repl - 1))))
        .withColumn("vec_id", F.col("vec_id") + F.col("rep") * (10 * n_emb))
        .drop("rep")
        .repartition(4 * CPUS)
        .localCheckpoint(eager=True)
    )

    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    nat = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n_users = ev.agg(F.max("user_id")).first()[0] + 1
    ev_r = (
        ev.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(repl - 1))))
        .withColumn("user_id", F.col("user_id") + F.col("rep") * (10 * n_users))
        .drop("rep")
        .repartition(4 * CPUS)
        .localCheckpoint(eager=True)
    )
    n_cust = cust.count()
    cust_r = (
        cust.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(repl - 1))))
        .withColumn("c_custkey", F.col("c_custkey") + F.col("rep") * (10 * n_cust))
        .drop("rep")
        .repartition(4 * CPUS)
        .localCheckpoint(eager=True)
    )

    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda t: t != F.lit(""))
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(2), F.size(toks)),
            lambda i: F.concat_ws(" ", F.element_at(toks, i - 1), F.element_at(toks, i)),
        ),
    ).otherwise(F.array().cast("array<string>"))

    def job_repeated_spans():
        return repeated_ngram_spans(docs_r, n=4, min_docs=2).count()

    def job_cms_heavy():
        grams = docs_r.select(F.explode(bigrams).alias("bigram")).localCheckpoint(
            eager=True
        )
        return cms_heavy_hitters(
            grams, "bigram", threshold=100 * repl, depth=4, width=256
        ).count()

    def job_bloom_pass():
        grams = (
            docs_r.select("doc_id", F.explode(bigrams).alias("bigram"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        ev = grams.filter(F.col("doc_id") % 10 == 0).select("bigram")
        train = grams.filter(F.col("doc_id") % 10 != 0)
        bloom = bloom_build(ev, "bigram", m_bits=1 << 20, k_hashes=3)
        maybe = bloom_maybe_contains(
            bloom, train.select("bigram").distinct(), "bigram", 1 << 20, 3
        )
        return (
            train.join(maybe, "bigram")
            .groupBy("doc_id")
            .agg(F.sum("maybe").alias("h"))
            .count()
        )

    cbs = train_pq_codebooks(emb, m=8, k=16, iterations=2)

    def job_pq_encode():
        enc = pq_encode(emb_r, cbs)
        return enc.agg(F.sum(F.element_at("codes", 1))).first()[0] and enc.count()

    def job_triangles():
        cn = cust_r.select(
            F.col("c_custkey").alias("src"),
            (F.col("c_nationkey") + 100000000).alias("dst"),
        )
        cr = cust_r.join(nat, cust_r["c_nationkey"] == nat["n_nationkey"]).select(
            F.col("c_custkey").alias("src"),
            (F.col("n_regionkey") + 200000000).alias("dst"),
        )
        nr = nat.select(
            (F.col("n_nationkey") + 100000000).alias("src"),
            (F.col("n_regionkey") + 200000000).alias("dst"),
        )
        n = triangle_count(cn.unionByName(cr).unionByName(nr)).first()["n_triangles"]
        assert n == repl * n_cust, (n, repl * n_cust)
        return n

    def job_pack():
        from chronographer_spark.operators.packing import pack_sequences

        toks_df = docs_r.select(
            "doc_id", F.size(F.split(F.col("text"), " ")).alias("n_tok")
        )
        out = pack_sequences(toks_df, "doc_id", "n_tok", budget=512, n_parts=4 * CPUS)
        agg = out.agg(
            F.sum("n_tokens").alias("tot"), F.max("last_chunk").alias("mx")
        ).first()
        # the chunk stream must exactly tile the total token count
        assert agg["mx"] == (agg["tot"] - 1) // 512, agg
        return agg["mx"] + 1

    def job_repetition():
        from chronographer_spark.operators.text import repetition_metrics

        return repetition_metrics(docs_r).count()

    def job_prefix_jaccard():
        # exact-recall similarity join; replication makes every replica
        # group a J=1 clique, so output grows ~quadratically in repl BY
        # CONSTRUCTION (like minhash_lsh) — judge per-pair cost
        from chronographer_spark.operators.dedup import prefix_jaccard_join

        return prefix_jaccard_join(docs_r, threshold=0.8, shingle_n=3).count()

    def job_k_core():
        # 4 fixed peel rounds (exact_rounds: identical work at every repl)
        # over the c-n-r graph; customers peel in round 1, the remaining
        # rounds run on the small nation/region residue
        from chronographer_spark.operators.graph_algos import k_core

        cn = cust_r.select(
            F.col("c_custkey").alias("src"),
            (F.col("c_nationkey") + 100000000).alias("dst"),
        )
        nr = nat.select(
            (F.col("n_nationkey") + 100000000).alias("src"),
            (F.col("n_regionkey") + 200000000).alias("dst"),
        )
        return k_core(
            cn.unionByName(nr), k=3, max_rounds=4, exact_rounds=True
        ).count()

    def job_allen():
        # per-user per-type activity spans; pair count rides user count
        from chronographer_spark.operators.temporal import allen_relations

        iv = ev_r.groupBy("user_id", "event_type").agg(
            F.min("ts").alias("begin"), F.max("ts").alias("end")
        )
        return allen_relations(
            iv, on=["user_id"], id_col="event_type",
            begin_col="begin", end_col="end",
        ).count()

    def job_dialogue():
        # conversation metrics over a transcripts-shaped frame derived from
        # the replicated events (conversation count rides repl); single
        # conv_id-keyed shuffle by design
        from pyspark.sql.window import Window

        from chronographer_spark.operators.dialogue import conversation_metrics

        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        tx = ev_r.withColumn("rn", F.row_number().over(w)).select(
            F.col("user_id").cast("string").alias("conv_id"),
            (F.col("rn") - 1).cast("int").alias("turn_idx"),
            F.lit("user").alias("role"),
            F.col("event_type").alias("text"),
            F.when((F.col("rn") - 1) % 3 == 2, F.col("event_type"))
            .otherwise(F.lit(""))
            .alias("tool"),
            F.col("ts"),
        )
        return conversation_metrics(tx, long_gap_s=3600).count()

    def job_walks():
        # 3-step walks from every replicated user over the user<->type
        # bipartite graph, then skip-gram extraction; walk count rides repl,
        # hub (type) degree grows linearly with repl
        from chronographer_spark.operators.graph_algos import (
            random_walks,
            walk_skipgrams,
        )

        u2t = ev_r.select(
            F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("src"),
            F.concat(F.lit("t"), F.col("event_type")).alias("dst"),
        ).distinct()
        edges = u2t.unionByName(
            u2t.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        starts = u2t.select(F.col("src").alias("node")).distinct()
        walks = random_walks(edges, n_steps=3, starts=starts)
        return walk_skipgrams(walks, window=2).count()

    def job_negatives():
        # full embedding-training-data chain at scale: replicated walks ->
        # skip-grams -> 5 negatives/pair. Vocabulary (u-nodes) rides repl;
        # the unigram table stays ~fixed (2^20 slots, word2vec's contract),
        # so the draw join is O(pairs x 1) on a skew-free slot key
        from chronographer_spark.operators.graph_algos import (
            negative_samples,
            random_walks,
            walk_skipgrams,
        )

        u2t = ev_r.select(
            F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("src"),
            F.concat(F.lit("t"), F.col("event_type")).alias("dst"),
        ).distinct()
        edges = u2t.unionByName(
            u2t.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        starts = u2t.select(F.col("src").alias("node")).distinct()
        pairs = walk_skipgrams(random_walks(edges, n_steps=3, starts=starts), 2)
        return negative_samples(pairs, k=5, target_slots=1 << 20).count()

    def job_metapath():
        # 2-layer typed graph: user -[event_type]-> day -[in_week]-> week.
        # Day mids' in-degree rides repl x users — the exact hub case the
        # degree-product identity keeps linear (a wedge join would emit
        # in_deg x 1 rows per mid per pattern)
        from chronographer_spark.operators.graph_algos import metapath_counts

        a = ev_r.select(
            F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("subject"),
            F.col("event_type").alias("predicate"),
            F.concat(F.lit("d"), F.to_date("ts").cast("string")).alias("object"),
        )
        b = (
            a.select(F.col("object").alias("subject")).distinct()
            .withColumn("predicate", F.lit("in_week"))
            .withColumn(
                "object",
                F.concat(F.lit("w"), F.weekofyear(F.to_date(F.substring("subject", 2, 10)))),
            )
        )
        return metapath_counts(a.unionByName(b)).count()

    def job_comention():
        # replicas repeat the same mention values, so each mention's df and
        # the pair output grow ~linearly/quadratically with repl BY
        # CONSTRUCTION — cap scales with repl to keep the same df profile;
        # judge per output PAIR
        from chronographer_spark.operators.dialogue import comention_graph

        mentions = ev_r.select(
            F.col("user_id").cast("string").alias("conv_id"),
            F.concat(
                F.col("event_type"),
                F.lit("|"),
                F.floor(F.col("value")).cast("long").cast("string"),
            ).alias("mention"),
        )
        return comention_graph(mentions, max_df=40 * repl).count()

    def job_typicality():
        # corpus bigram counts + per-doc score; bigram vocabulary saturates
        # under replication (replicas repeat text), counts just grow
        from chronographer_spark.operators.text import bigram_typicality

        return bigram_typicality(docs_r).count()

    def job_topic():
        # per-turn token join keyed by (conv, turn): rides turn count
        from pyspark.sql.window import Window

        from chronographer_spark.operators.dialogue import topic_boundaries

        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        tx = ev_r.withColumn("rn", F.row_number().over(w)).select(
            F.col("user_id").cast("string").alias("conv_id"),
            (F.col("rn") - 1).cast("int").alias("turn_idx"),
            F.lit("user").alias("role"),
            F.concat(F.lit("event "), F.col("event_type"), F.lit(" value "),
                     F.floor(F.col("value")).cast("long").cast("string")).alias("text"),
            F.lit("").alias("tool"),
            F.col("ts"),
        )
        return topic_boundaries(tx).count()

    def job_corpus_overlap():
        from chronographer_spark.operators.sketches import corpus_overlap

        return corpus_overlap(docs_r, n_hashes=16).count()

    def job_hyperball():
        # 2 HLL-propagation rounds over the replicated customer<->nation
        # graph: hub register fan-out rides repl x 64 registers — the
        # constant-state-per-node claim under a growing ball
        from chronographer_spark.operators.graph_algos import hyperball

        e = cust_r.select(
            F.col("c_custkey").alias("src"),
            (F.col("c_nationkey") + 100000000).alias("dst"),
        )
        sym = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        out = hyperball(sym, rounds=2).count()
        assert out == 3 * (repl * n_cust + 25), out  # (t=0,1,2) x V
        return out

    def job_bfs():
        # landmark BFS from customers 0/1: round-2 frontier = all replicated
        # customers of two nations (rides repl); the nation-hub edge join is
        # the skew case AQE must split
        from chronographer_spark.operators.graph_algos import bfs_distances

        e = cust_r.select(
            F.col("c_custkey").alias("src"),
            (F.col("c_nationkey") + 100000000).alias("dst"),
        )
        sym = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        return bfs_distances(sym, landmarks=[0, 1], rounds=2).count()

    def job_ppr():
        # sparse personalized pagerank from 2 seeds: touched set = the
        # seeds' nation communities (rides repl), never V
        from chronographer_spark.operators.graph_algos import personalized_pagerank

        e = cust_r.select(
            F.col("c_custkey").alias("src"),
            (F.col("c_nationkey") + 100000000).alias("dst"),
        )
        sym = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        return personalized_pagerank(sym, seeds=[0, 1], iterations=2).count()

    def job_luby():
        # symmetry breaking on the star graph: every customer contends only
        # with its nation hub, so round 1 decides ~everything — the
        # priority-carrying hub join is the whole cost
        from chronographer_spark.operators.graph_algos import luby_mis

        e = cust_r.select(
            F.col("c_custkey").alias("src"),
            (F.col("c_nationkey") + 100000000).alias("dst"),
        )
        sym = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        out = luby_mis(sym, rounds=2)
        return out.filter(F.col("state") == "in").count()

    def job_lcc():
        # per-node triangle credit over the triangle-per-customer graph;
        # every customer must score lcc = 1e6 at any repl
        from chronographer_spark.operators.graph_algos import clustering_coefficient

        cn = cust_r.select(
            F.col("c_custkey").alias("src"),
            (F.col("c_nationkey") + 100000000).alias("dst"),
        )
        cr = cust_r.join(nat, cust_r["c_nationkey"] == nat["n_nationkey"]).select(
            F.col("c_custkey").alias("src"),
            (F.col("n_regionkey") + 200000000).alias("dst"),
        )
        nr = nat.select(
            (F.col("n_nationkey") + 100000000).alias("src"),
            (F.col("n_regionkey") + 200000000).alias("dst"),
        )
        out = clustering_coefficient(cn.unionByName(cr).unionByName(nr))
        bad = out.filter(
            (F.col("node") < 100000000) & (F.col("lcc_x1e6") != 1000000)
        ).count()
        assert bad == 0, bad
        return out.count()

    def job_boilerplate():
        # corpus-level line-df pass + reassembly: replication multiplies
        # every line's df by repl while the threshold rides n_docs, so the
        # boilerplate set (and per-doc drop profile) is repl-invariant —
        # cost is pure bandwidth in the line table
        from chronographer_spark.operators.text import boilerplate_removal

        return boilerplate_removal(
            docs_r, line_tokens=2, max_doc_frac=0.03125, min_docs=2
        ).count()

    def job_span_rewrite():
        # replication makes EVERY gram cross-doc duplicated with the lowest
        # replica as owner: all other replicas are rewritten to ~empty.
        # Coverage stays linear in the gram table (each hit expands to n
        # positions, then a per-doc anti-join) — judge per DOC
        from chronographer_spark.operators.dedup import remove_repeated_spans

        out = remove_repeated_spans(docs_r, n=3, min_docs=2)
        # sum a real column: a bare count() lets Catalyst ELIMINATE the
        # left join (aggregate right side has unique keys) and measure
        # only the token-count scan
        agg = out.agg(
            F.count(F.lit(1)).alias("n"), F.sum("n_dropped").alias("d")
        ).first()
        assert agg["d"] > 0
        return agg["n"]

    def job_cdc():
        # chunk segmentation is map-only per doc; replicas produce byte-
        # identical chunk texts, so the global chunk-text agg's GROUP
        # cardinality is repl-invariant while instance counts ride repl
        from chronographer_spark.operators.dedup import cdc_dedup_stats

        return cdc_dedup_stats(docs_r, trigger_mod=8).count()

    def job_kcenter():
        # k map-only distance passes + k TakeOrdered(1); replicas of the
        # chosen centers sit at distance 0, so selection stays stable and
        # cost is k linear scans of the replicated corpus
        from chronographer_spark.operators.similarity import kcenter_greedy

        return kcenter_greedy(emb_r, k=4).count()

    def _rdfs_chain(seminaive):
        # 12-deep subclass chain over replicated typed instances: naive
        # evaluation re-derives the whole closure every round (round t
        # carries t x instances), semi-naive carries only the frontier —
        # the round-cost claim in graph/rdfs.py measured head to head
        from chronographer_spark.graph.rdfs import rdfs_materialize

        depth = 12
        schema = spark.createDataFrame(
            [(f"C{i}", "rdfs:subClassOf", f"C{i+1}") for i in range(depth)],
            "subject string, predicate string, object string",
        )
        data = cust_r.select(
            F.concat(F.lit("c"), F.col("c_custkey").cast("string")).alias(
                "subject"
            ),
            F.lit("rdf:type").alias("predicate"),
            F.lit("C0").alias("object"),
        )
        out = rdfs_materialize(
            data, schema, max_rounds=depth + 1, seminaive=seminaive
        ).count()
        assert out == (depth + 1) * repl * n_cust, out
        return out

    def job_rdfs_naive():
        return _rdfs_chain(False)

    def job_rdfs_semi():
        return _rdfs_chain(True)

    def job_scd2():
        # change-point window per (user, type): rides event count, one
        # entity-keyed shuffle; replicas are independent users
        from chronographer_spark.operators.temporal import scd2_compact

        ev2 = ev_r.select(
            "user_id", "event_type", "event_id", "ts",
            F.floor(F.col("value") / 25).cast("long").alias("v"),
        )
        return scd2_compact(
            ev2, keys=["user_id", "event_type"], value_col="v",
            tiebreak="event_id",
        ).count()

    def job_blocked_er():
        # replicas share names -> cross-replica pairs are REAL matches, so
        # block joins grow ~repl^2 by construction (minhash_lsh family) —
        # judge per output PAIR
        from chronographer_spark.linking.blocking import blocked_match_scores

        base = cust_r.select(
            F.col("c_custkey").alias("id"),
            F.col("c_name").alias("name"),
            F.col("c_nationkey").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
        )
        pert = base.withColumn("id", F.col("id") + 1000000000)
        return blocked_match_scores(
            base, pert, id_col="id",
            blocks=[["nation", "segment"]],
            agreements=[("name", 10), ("segment", 2)],
            min_score=10,
        ).count()

    def job_textrank():
        # vocab graph is repl-invariant; the corpus explode dominates
        from chronographer_spark.operators.text import textrank_keywords

        return textrank_keywords(docs_r, top_k=20).count()

    def job_ktruss():
        # one exact peel + final support readout over the c-n-r triangle
        # graph with order->cust chaff (chaff = 10 x customers, all peeled
        # in round 1); hub degrees ride repl, the orientation keeps wedge
        # generation at the degree-2 customers
        from chronographer_spark.operators.graph_algos import k_truss

        cn = cust_r.select(
            F.col("c_custkey").alias("src"),
            (F.col("c_nationkey") + 100000000).alias("dst"),
        )
        cr = cust_r.join(nat, cust_r["c_nationkey"] == nat["n_nationkey"]).select(
            F.col("c_custkey").alias("src"),
            (F.col("n_regionkey") + 200000000).alias("dst"),
        )
        nr = nat.select(
            (F.col("n_nationkey") + 100000000).alias("src"),
            (F.col("n_regionkey") + 200000000).alias("dst"),
        )
        chaff = cust_r.select(
            F.col("c_custkey").alias("dst"),
            F.explode(
                F.sequence(
                    F.col("c_custkey") * 10 + 300000000,
                    F.col("c_custkey") * 10 + 300000009,
                )
            ).alias("src"),
        ).select("src", "dst")
        e = cn.unionByName(cr).unionByName(nr).unionByName(chaff)
        out = k_truss(e, k=3, max_rounds=1, exact_rounds=True)
        n = out.count()
        assert n == 2 * repl * n_cust + 25, n  # cn + cr + nr survive
        return n

    def job_bpe():
        # word_freqs' corpus-wide explode+agg rides repl (the one real
        # shuffle); the vocab table it emits is repl-INVARIANT (replicas
        # share the word distribution), so the 4 merge rounds are
        # constant-cost — judge throughput per corpus TOKEN. Segmentation
        # is a pure projection over the replicated corpus.
        from chronographer_spark.operators.bpe import (
            bpe_segment,
            bpe_train,
            word_freqs,
        )

        merges, _ = bpe_train(word_freqs(docs_r), n_merges=4)
        row = (
            bpe_segment(docs_r, merges)
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("n_tokens_bpe").alias("t"),
            )
            .collect()[0]
        )
        assert len(merges) == 4 and row["t"] > row["n"]
        return int(row["n"])

    def job_er_fuse():
        # full ER composition: blocked scores -> CC -> attribute fusion.
        # Replicas share names, so every original customer's 2·repl records
        # (base+pert across replicas) collapse into ONE component: match
        # edges grow ~repl² (judge per EDGE, same family as blocked_er),
        # components stay n_cust, fusion input rides repl.
        from chronographer_spark.linking.blocking import blocked_match_scores
        from chronographer_spark.linking.canonicalize import connected_components
        from chronographer_spark.linking.fusion import fuse_attributes

        base = cust_r.select(
            F.col("c_custkey").alias("id"),
            F.col("c_name").alias("name"),
            F.col("c_nationkey").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
        )
        pert = base.withColumn("id", F.col("id") + 1000000000)
        edges = blocked_match_scores(
            base, pert, id_col="id",
            blocks=[["nation", "segment"]],
            agreements=[("name", 10)],
            min_score=10,
        ).select(F.col("a_id").alias("src"), F.col("b_id").alias("dst"))
        recs = base.unionByName(pert)
        cc = connected_components(
            edges, all_nodes=recs.select(F.col("id").alias("node"))
        )
        refs = cc.select(
            F.col("node").alias("alias"), F.col("component").alias("canonical")
        )
        assertions = recs.select(
            F.col("id").alias("entity"),
            F.lit("segment").alias("attr"),
            F.col("segment").alias("value"),
        ).unionByName(
            recs.select(
                F.col("id").alias("entity"),
                F.lit("nation").alias("attr"),
                F.col("nation").cast("string").alias("value"),
            )
        )
        fused = fuse_attributes(assertions, referents=refs)
        row = fused.agg(
            F.count(F.lit(1)).alias("n"), F.sum("total").alias("t")
        ).collect()[0]
        assert row["n"] == 2 * n_cust, row  # n_cust components x 2 attrs
        assert row["t"] == 4 * repl * n_cust, row  # every vote pooled
        return int(row["t"])

    def job_transe():
        # link-prediction eval: the candidates pass is entities x
        # BROADCAST(test) — work linear in entity count at pinned test size
        # (h % (100·repl) == 0 keeps ~n_emb/100 test triples) — judge per
        # CANDIDATE (= test · entities)
        from chronographer_spark.graph.link_prediction import transe_rank_eval
        from chronographer_spark.operators.similarity import quantize_vectors

        ents = quantize_vectors(emb_r).select("vec_id", "qvec")
        trips = (
            ents.select(
                F.col("vec_id").alias("h"),
                F.lit("r").alias("r"),
                (F.col("vec_id") + 17).alias("t"),
            )
            .join(
                ents.select(F.col("vec_id").alias("tid")),
                F.col("t") == F.col("tid"),
            )
            .drop("tid")
        )
        out = transe_rank_eval(
            trips, ents, k=10, test_filter=F.col("h") % (100 * repl) == 0
        )
        row = out.agg(
            F.count(F.lit(1)).alias("n"), F.sum("rank").alias("s")
        ).collect()[0]
        assert row["n"] > 0 and row["s"] >= row["n"]
        return int(row["n"]) * repl * n_emb  # candidates scored

    def job_gazetteer():
        # dictionary spotting: word-soup vocabulary makes EVERY anchor a
        # corpus-scale hub (worst case for the candidate join, on purpose);
        # candidates = occurrences of the 20 anchor tokens, linear in
        # corpus size — judge per TOKEN scanned (repl-linear)
        from chronographer_spark.extraction.gazetteer import gazetteer_match

        w = F.split(F.lower(F.col("text")), " ")
        top = (
            docs_r.filter(F.size(w) >= 2)
            .select(
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size(w) - 1),
                        lambda i: F.concat_ws(
                            " ", F.element_at(w, i), F.element_at(w, i + 1)
                        ),
                    )
                ).alias("bigram")
            )
            .groupBy("bigram")
            .agg(F.count(F.lit(1)).alias("c"))
            .orderBy(F.col("c").desc(), F.col("bigram"))
            .limit(20)
            .select(F.col("bigram").alias("phrase"))
        )
        occ = gazetteer_match(docs_r, top)
        row = occ.agg(
            F.count(F.lit(1)).alias("n"), F.sum("start").alias("s")
        ).collect()[0]
        assert row["n"] > 0 and row["s"] is not None
        return int(row["n"])

    def job_snowball():
        # full bootstrap round: pairs (checkpointed once) -> pattern profile
        # -> reliable patterns -> new-triple extraction. Pattern/pair volume
        # rides repl linearly; the profile and KB stay dimension-sized.
        from chronographer_spark.extraction.distant import snowball_extract

        kb = spark.createDataFrame(
            [
                ("join", "needs", "merge"),
                ("merge", "precedes", "join"),
                ("spark", "runs", "join"),
                ("customer", "filters", "window"),
            ],
            "subj string, pred string, obj string",
        )
        out = snowball_extract(
            docs_r,
            ["spark", "join", "merge", "customer", "window"],
            kb,
            max_gap=4,
            min_pattern_pairs=2,
            min_precision_x1e6=600000,
        )
        # force the real aggregation (bench hygiene: count real columns)
        return out.agg(F.count(F.lit(1)), F.sum("support")).first()[0]

    def job_classifier():
        # train + score in one pass over the replicated corpus; the token
        # explode runs once (eager checkpoint), model stays vocab-sized.
        from chronographer_spark.operators.classifier import classify_documents

        out = classify_documents(
            docs_r.withColumn("is_en", (F.col("lang") == "en").cast("long")),
            label_col="is_en",
            min_count=5,
        )
        return out.agg(F.count(F.lit(1)), F.sum("score_x1e6")).first()[0]

    def job_ssl():
        # 2 clamped rounds over the replicated users' temporal-adjacency
        # graph; edges ride repl linearly, votes are node-keyed aggs.
        from chronographer_spark.operators.graph_algos import ssl_label_propagation
        from pyspark.sql.window import Window

        w = Window.partitionBy("event_type").orderBy("ts", "event_id")
        edges = (
            ev_r.select(
                F.col("user_id").alias("src"),
                F.lead("user_id").over(w).alias("dst"),
            )
            .filter(F.col("dst").isNotNull() & (F.col("dst") != F.col("src")))
        )
        seeds = (
            ev_r.groupBy("user_id")
            .agg(F.min(F.struct("ts", "event_id", "event_type")).alias("f"))
            .filter(F.col("user_id") % 5 == 0)
            .select(
                F.col("user_id").alias("node"), F.col("f.event_type").alias("label")
            )
        )
        out = ssl_label_propagation(edges, seeds, iterations=2)
        return out.agg(
            F.count(F.lit(1)), F.count("label")
        ).first()[0]

    def job_subclass():
        # instance-keyed self-join over replicated typed users; the type
        # vocabulary (and so the candidate table) is repl-invariant.
        from chronographer_spark.graph.constraints import induce_subclass_candidates

        typed = ev_r.select(
            F.col("user_id").alias("instance"), F.col("event_type").alias("type")
        )
        out = induce_subclass_candidates(
            typed, min_support=5, min_containment_x1e6=900000
        )
        return out.agg(F.count(F.lit(1)), F.sum("n_both")).first()[0]

    def job_scc():
        # 25 x repl disjoint double-star SCCs (hub <-> each member): SCC
        # diameter 2, so coloring converges in a constant round count and
        # cost is pure edge bandwidth riding repl; every group must come
        # back as ONE component labeled by its min member
        from chronographer_spark.operators.graph_algos import (
            strongly_connected_components,
        )

        hub = (F.col("c_nationkey") + F.floor(F.col("c_custkey") / (10 * n_cust))
               * 1000 + 100000000)
        e = cust_r.select(F.col("c_custkey").alias("src"), hub.alias("dst"))
        edges = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        out = strongly_connected_components(edges)
        n_sccs = out.select("scc").distinct().count()
        assert n_sccs == 25 * repl, n_sccs
        return out.count()

    def job_sssp():
        # 3-round Bellman-Ford from customer 0 over the symmetrized
        # customer<->nation star with unit costs: round 2's frontier is one
        # nation's customers (rides repl), round 3 fans across hub-hub
        # bridges — the weighted sibling of job_bfs, same skew shape
        from chronographer_spark.operators.graph_algos import bounded_sssp

        e = cust_r.select(
            F.col("c_custkey").alias("src"),
            (F.col("c_nationkey") + 100000000).alias("dst"),
            F.lit(1).alias("w"),
        )
        bridges = nat.select(
            (F.col("n_nationkey") + 100000000).alias("src"),
            (F.col("n_regionkey") + 100000050).alias("dst"),
            F.lit(3).alias("w"),
        )
        sym = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
        ).unionByName(bridges)
        return bounded_sssp(sym, 0, rounds=3).count()

    def job_truth():
        # claims ride repl while the source set stays 20 and the
        # (entity, attr) groups stay repl-invariant: per-round cost is the
        # claim-table scan + two map-side-combinable aggs
        from chronographer_spark.linking.fusion import truth_discovery

        claims = ev_r.select(
            (F.col("user_id") % 20).cast("long").alias("src"),
            F.col("event_type").alias("entity"),
            F.date_format("ts", "yyyy-MM-dd").alias("attr"),
            F.floor(F.col("value") / 50).cast("long").cast("string").alias("value"),
        )
        out = truth_discovery(claims, rounds=2)
        agg = out.agg(F.count(F.lit(1)).alias("n"), F.sum("score").alias("s")).first()
        assert agg["s"] > 0
        return agg["n"]

    def job_kanon():
        # one quasi-identifier groupBy over the replicated events + a
        # class-level threshold fan: replicas are distinct users, so class
        # COUNT rides repl while per-class size distribution is invariant
        from chronographer_spark.operators.text import k_anonymity_profile

        ev2 = ev_r.select(
            "event_type",
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            F.floor(F.col("value") / 100).cast("long").alias("vband"),
            (F.col("user_id") % 50).alias("ubkt"),
        )
        out = k_anonymity_profile(
            ev2, ["event_type", "day", "vband", "ubkt"], k_thresholds=(2, 5, 20)
        )
        agg = out.agg(F.count(F.lit(1)).alias("n"), F.sum("n_classes").alias("c")).first()
        assert agg["n"] == 3 and agg["c"] > 0
        return int(agg["c"]) // 3

    def job_ind():
        # value stream rides repl (replicated customer/order keys); the
        # attr-set agg and |attrs|^2 pair fan are value-count-bounded
        from chronographer_spark.graph.constraints import discover_unary_inds

        ords = spark.read.parquet(f"{SF_DIR}/orders.parquet")
        n_ord = ords.count()
        ords_r = (
            ords.withColumn(
                "rep", F.explode(F.sequence(F.lit(0), F.lit(repl - 1)))
            )
            .withColumn(
                "o_custkey", F.col("o_custkey") + F.col("rep") * (10 * n_cust)
            )
            .drop("rep")
            .repartition(4 * CPUS)
        )
        out = discover_unary_inds(
            [
                ("cust.key", cust_r, "c_custkey"),
                ("cust.nation", cust_r, "c_nationkey"),
                ("orders.cust", ords_r, "o_custkey"),
                ("nation.key", nat, "n_nationkey"),
                ("nation.region", nat, "n_regionkey"),
            ]
        )
        agg = out.agg(F.count(F.lit(1)).alias("n"), F.sum("n_common").alias("s")).first()
        assert agg["s"] > 0
        return agg["n"]

    def job_subseq():
        # replicated users = replicated conversations: the (seq,item)
        # position table rides repl, the vocabulary (5 tools) is fixed,
        # so pair/triple fan-out stays 25/125 PER SEQUENCE by design
        from pyspark.sql.window import Window

        from chronographer_spark.operators.sequence import frequent_subsequences

        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        tx = ev_r.withColumn("rn", F.row_number().over(w)).select(
            F.col("user_id").cast("string").alias("conv_id"),
            (F.col("rn") - 1).cast("int").alias("turn_idx"),
            F.when((F.col("rn") - 1) % 3 == 2, F.col("event_type"))
            .otherwise(F.lit(""))
            .alias("tool"),
        )
        out = frequent_subsequences(tx, min_support=10, max_len=3)
        agg = out.agg(F.count(F.lit(1)).alias("n"), F.sum("support").alias("s")).first()
        assert agg["s"] > 0
        return agg["n"]

    def job_cusum():
        # per-user daily series: the (key,bucket) checkpoint table and the
        # per-key window exchange both ride repl (users are distinct per
        # replica); thr=0 keeps the alarm set non-trivial so the final
        # filter+project is timed too
        from chronographer_spark.operators.temporal import cusum_alarms

        out = cusum_alarms(ev_r, key="user_id", ts_col="ts", thr_buckets=0)
        agg = out.agg(
            F.count(F.lit(1)).alias("n"), F.sum("s_scaled").alias("s")
        ).first()
        assert agg["s"] is None or agg["s"] >= 0
        return agg["n"]

    def job_acf():
        # same scale shape as cusum plus the lead columns and the lag fan
        from chronographer_spark.operators.temporal import acf_buckets

        out = acf_buckets(ev_r, key="user_id", ts_col="ts", lags=(1, 2, 3))
        agg = out.agg(
            F.count(F.lit(1)).alias("n"), F.sum("acf_x1e3").alias("s")
        ).first()
        assert agg["n"] > 0
        return agg["n"]

    def job_cohort():
        # distinct(user,day) and the min-cohort agg ride repl linearly; the
        # (cohort, age) matrix saturates at 30x30
        from chronographer_spark.operators.temporal import cohort_retention

        out = cohort_retention(ev_r, user_col="user_id", ts_col="ts")
        agg = out.agg(
            F.count(F.lit(1)).alias("n"), F.sum("n_active").alias("s")
        ).first()
        assert agg["s"] > 0
        return agg["n"]

    def job_copurchase():
        # replicated orders with distinct keys: the basket self-join fan
        # rides repl x (<=7 lineitems)^2; marginals/total stay broadcast
        from chronographer_spark.operators.baskets import copurchase_lift

        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
            "l_orderkey", "l_partkey"
        )
        part = spark.read.parquet(f"{SF_DIR}/part.parquet").select(
            "p_partkey", "p_brand"
        )
        n_ord = li.agg(F.max("l_orderkey")).first()[0]
        li_r = (
            li.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(repl - 1))))
            .withColumn("l_orderkey", F.col("l_orderkey") + F.col("rep") * (10 * n_ord))
            .drop("rep")
            .repartition(4 * CPUS)
        )
        b = li_r.join(F.broadcast(part), li_r["l_partkey"] == part["p_partkey"]).select(
            F.col("l_orderkey").alias("basket_id"), F.col("p_brand").alias("item")
        )
        out = copurchase_lift(b, min_pairs=5)
        agg = out.agg(
            F.count(F.lit(1)).alias("n"), F.sum("n_pairs").alias("s")
        ).first()
        assert agg["s"] > 0
        return agg["n"]

    def job_featprop():
        # ring+skip graph over replicated vec ids: |E| = 2n rides repl,
        # d = 8 dims; per-round cost is the (node, dim) agg — the honest
        # |E|·d shape
        from chronographer_spark.operators.graph_algos import feature_propagation

        n_nodes = emb_r.count()
        feats = emb_r.select(
            F.col("vec_id").alias("node"),
            F.transform(
                F.slice("embedding", 1, 8),
                lambda x: F.floor(x.cast("double") * 1000 + F.lit(0.5)).cast("long"),
            ).alias("vec"),
        )
        base = emb_r.select("vec_id")
        edges = base.select(
            F.col("vec_id").alias("src"),
            F.pmod(F.col("vec_id") + 1, F.lit(n_nodes)).alias("dst"),
        ).unionAll(
            base.select(
                F.col("vec_id").alias("src"),
                F.pmod(F.col("vec_id") + 7, F.lit(n_nodes)).alias("dst"),
            )
        )
        out = feature_propagation(edges, feats, rounds=2)
        agg = out.agg(F.count(F.lit(1)).alias("n"), F.sum("val").alias("s")).first()
        assert agg["n"] > 0
        return agg["n"]

    def job_snm_lev():
        # window-5 candidates ride n linearly; each pair pays a <=64x64 DP
        from chronographer_spark.linking.blocking import blocked_levenshtein_pairs

        keyed = docs_r.select(
            F.substring("text", 1, 16).alias("key"), "doc_id", "text"
        )
        out = blocked_levenshtein_pairs(
            keyed, ["key"], "doc_id", "text", window=5, max_dist=8
        )
        agg = out.agg(F.count(F.lit(1)).alias("n"), F.sum("lev").alias("s")).first()
        assert agg["n"] > 0
        return agg["n"]

    def job_novelty():
        # gram explode rides corpus size; replicas make later buckets
        # pure repeats, so the curve's tail novelty collapses on purpose
        from chronographer_spark.operators.text import ngram_novelty_curve

        out = ngram_novelty_curve(docs_r, n=3, bucket_size=1000)
        agg = out.agg(
            F.count(F.lit(1)).alias("n"), F.sum("n_novel").alias("s")
        ).first()
        assert agg["s"] > 0
        return agg["n"]


    def job_spearman():
        # replicas multiply every (x, y) tie block by repl: the rank +
        # RANGE-cumulative tie count does linear work per key on one
        # exchange, so per-row cost should stay flat as repl grows
        from chronographer_spark.operators.temporal import spearman_corr

        rows = ev_r.select(
            "event_type",
            F.unix_timestamp("ts").cast("long").alias("x"),
            F.floor(F.col("value") * 100).cast("long").alias("y"),
        )
        out = spearman_corr(rows, key="event_type", x_col="x", y_col="y")
        agg = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.abs(F.col("spearman_r2_x1e6"))).alias("s"),
        ).first()
        assert agg["s"] is not None
        return agg["n"]

    def job_dbscan():
        # density contract: blob COUNT scales with input (≈100 points per
        # site), so points-per-cell is constant and candidate pairs grow
        # linearly — the documented DBSCAN scale shape
        from chronographer_spark.operators.clustering import dbscan_grid

        n_ev = ev.count()
        nb = max(n_ev * repl // 200, 1)
        base = ev.select("event_id").withColumn(
            "rep", F.explode(F.sequence(F.lit(0), F.lit(repl - 1)))
        )
        pid = (F.col("event_id") * repl + F.col("rep")).cast("long")

        def h(tag):
            return F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(tag), pid.cast("string"))), 1, 8
                    ),
                    16,
                    10,
                ).cast("long"),
                F.lit(101),
            )

        pts = (
            base.select(
                pid.alias("id"),
                (pid % nb * 1000 + h("sx:") - 50).cast("long").alias("x"),
                (
                    F.expr(f"(event_id * {repl} + rep) DIV {nb} % 2 * 1000")
                    + h("sy:")
                    - 50
                ).cast("long").alias("y"),
            )
            .repartition(4 * CPUS)
            .localCheckpoint(eager=True)
        )
        out = dbscan_grid(pts, eps=200, min_pts=4)
        agg = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.abs(F.col("cluster"))).alias("s"),
        ).first()
        assert agg["s"] is not None
        return agg["n"]

    def job_viterbi():
        # the registry's only hot-path Python operator: one applyInPandas
        # decode per conversation. Conversations ride repl (disjoint user
        # ids), length distribution fixed — per-conv cost constant, so
        # throughput per CONVERSATION is the scale judgment
        from chronographer_spark.entry_queries import (
            VITERBI_EMIT,
            VITERBI_START,
            VITERBI_STATES,
            VITERBI_TRANS,
        )
        from pyspark.sql.window import Window

        from chronographer_spark.operators.sequence import viterbi_decode

        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        o = ev_r.withColumn("rn", F.row_number().over(w)).select(
            F.col("user_id").cast("string").alias("conv_id"),
            (F.col("rn") - 1).cast("long").alias("turn_idx"),
            F.element_at(
                F.array(F.lit("user"), F.lit("assistant"),
                        F.lit("lookup"), F.lit("action")),
                ((F.xxhash64("event_type", "event_id") % 4 + 4) % 4 + 1)
                .cast("int"),
            ).alias("obs"),
        )
        out = viterbi_decode(
            o, states=VITERBI_STATES, start=VITERBI_START,
            trans=VITERBI_TRANS, emit=VITERBI_EMIT,
        )
        agg = out.agg(
            F.count(F.lit(1)).alias("n"), F.sum("best_score").alias("s")
        ).first()
        assert agg["s"] is not None
        return agg["n"]

    def job_stump():
        # explode fans each replicated event into 3 (feature, value)
        # structs; the collapsed (feat, value) cell table is
        # repl-INVARIANT (same value grid), so only the fan + map-side
        # combine should ride repl
        from chronographer_spark.operators.classifier import decision_stump

        rows = ev_r.select(
            (F.col("event_type") == "error").alias("label"),
            F.floor(F.col("value").cast("double") * 100 + F.lit(0.5))
            .cast("long").alias("vcents"),
            F.hour("ts").cast("long").alias("hour"),
            (F.col("user_id") % 16).cast("long").alias("ubucket"),
        )
        out = decision_stump(rows, ["vcents", "hour", "ubucket"], "label")
        agg = out.agg(
            F.count(F.lit(1)).alias("n"), F.sum("gini_x1e6").alias("s")
        ).first()
        assert agg["s"] is not None
        return agg["n"]

    def job_wis():
        # per-user interval count rides repl via disjoint users; the
        # rank window + prefix-sum + DP are all per-key linear
        from chronographer_spark.operators.sequence import (
            weighted_interval_schedule,
        )

        rows = ev_r.select(
            "user_id",
            "event_id",
            F.unix_timestamp("ts").cast("long").alias("s"),
            (F.unix_timestamp("ts").cast("long") + 3600).alias("e"),
            F.floor(F.col("value").cast("double") * 100 + F.lit(0.5))
            .cast("long").alias("w"),
        )
        out = weighted_interval_schedule(
            rows, key="user_id", start_col="s", end_col="e",
            weight_col="w", id_col="event_id",
        )
        agg = out.agg(
            F.count(F.lit(1)).alias("n"), F.sum("best_total").alias("s")
        ).first()
        assert agg["s"] > 0
        return agg["n"]

    def job_permtest():
        # the 64-way fan dominates: rows x 64 through ONE rank exchange
        # on perm; per-perm sums collapse map-side
        from chronographer_spark.operators.classifier import permutation_test

        rows = ev_r.filter(F.col("event_type").isin("error", "click")).select(
            F.col("event_id").alias("id"),
            F.floor(F.col("value").cast("double") * 100 + F.lit(0.5))
            .cast("long").alias("v"),
            (F.col("event_type") == "error").alias("label"),
        )
        out = permutation_test(rows, n_perms=64)
        agg = out.agg(
            F.count(F.lit(1)).alias("n"), F.sum("p_x1e6").alias("s")
        ).first()
        assert agg["s"] is not None
        return agg["n"]

    def job_corrmatrix():
        # 6-pair fan x two rank windows per pair — 12 in-partition
        # sorts over repl x rows on one exchange
        from chronographer_spark.operators.temporal import spearman_corr

        sec = F.unix_timestamp("ts").cast("long")
        vc = F.floor(F.col("value").cast("double") * 100 + F.lit(0.5)).cast(
            "long"
        )
        hr = F.expr("CAST(unix_timestamp(ts) AS BIGINT) % 86400 DIV 3600")
        dow = F.expr("(CAST(unix_timestamp(ts) AS BIGINT) DIV 86400 + 4) % 7")
        feats = [("vc", vc), ("hr", hr), ("dow", dow), ("bo", vc + hr * 100000)]
        fan = F.explode(
            F.array(*[
                F.struct(
                    F.lit(f"{na}~{nb}").alias("pair"),
                    ca.alias("x"), cb.alias("y"),
                )
                for i, (na, ca) in enumerate(feats)
                for (nb, cb) in feats[i + 1:]
            ])
        )
        rows = ev_r.select(fan.alias("p")).select("p.pair", "p.x", "p.y")
        out = spearman_corr(rows, key="pair", x_col="x", y_col="y")
        agg = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.abs(F.col("spearman_r2_x1e6"))).alias("s"),
        ).first()
        assert agg["s"] is not None
        return agg["n"]

    def job_attribution():
        # conversions x in-window touches per user: pair count rides
        # repl linearly (disjoint users), the funnel-contract equi-join
        from chronographer_spark.operators.temporal import touch_attribution

        out = touch_attribution(
            ev_r, key="user_id", type_col="event_type", ts_col="ts",
            id_col="event_id", conversion="purchase",
            touch_types=("click", "view"), window_seconds=7 * 86400,
        )
        agg = out.agg(
            F.count(F.lit(1)).alias("n"), F.sum("credit_x1e6").alias("s")
        ).first()
        assert agg["s"] > 0
        return agg["n"]

    def job_burst():
        # gap-stream Viterbi: same Python-path economics as job_viterbi
        # but 2 states and the lag window feeding it
        from pyspark.sql.window import Window

        from chronographer_spark.entry_queries import (
            BURST_EMIT,
            BURST_START,
            BURST_STATES,
            BURST_TRANS,
        )
        from chronographer_spark.operators.sequence import viterbi_decode

        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        gaps = (
            ev_r.select(
                "user_id",
                "event_id",
                F.unix_timestamp("ts").cast("long").alias("sec"),
                F.col("ts"),
            )
            .select(
                "user_id",
                (F.col("sec") - F.lag("sec").over(w)).alias("gap"),
                (F.row_number().over(w) - 2).cast("long").alias("gidx"),
            )
            .filter(F.col("gap").isNotNull())
            .select(
                F.col("user_id").cast("string").alias("conv_id"),
                F.col("gidx").alias("turn_idx"),
                F.when(F.col("gap") < 60, F.lit("fast"))
                .when(F.col("gap") < 3600, F.lit("mid"))
                .otherwise(F.lit("slow"))
                .alias("obs"),
            )
        )
        out = viterbi_decode(
            gaps, states=BURST_STATES, start=BURST_START,
            trans=BURST_TRANS, emit=BURST_EMIT,
        )
        agg = out.agg(
            F.count(F.lit(1)).alias("n"), F.sum("best_score").alias("s")
        ).first()
        assert agg["s"] is not None
        return agg["n"]

    def job_peak():
        # tagged sweep line: 2 rows per interval through one key window
        from chronographer_spark.operators.temporal import peak_concurrency

        rows = ev_r.select(
            "event_type",
            # distinct ids per replica (user_id already carries the rep)
            (F.col("event_id") * repl + F.col("user_id") % repl).alias(
                "event_id"
            ),
            F.unix_timestamp("ts").cast("long").alias("s"),
            (F.unix_timestamp("ts").cast("long") + 3600).alias("e"),
        )
        out = peak_concurrency(
            rows, key="event_type", start_col="s", end_col="e",
            id_col="event_id",
        )
        agg = out.agg(
            F.count(F.lit(1)).alias("n"), F.sum("peak").alias("s")
        ).first()
        assert agg["s"] > 0
        return agg["n"]

    def _typed_minute_edges():
        # user <-> (type, minute, rep) bipartite graph; dst carries the
        # replica index so replicas are DISJOINT components — the soak
        # measures the machinery riding edge count, per the operators'
        # documented contract (bucket the neighbor space; hub wedges are
        # C(d,2) and must be capped upstream)
        return ev_r.select(
            F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("src"),
            F.concat(
                F.lit("t"),
                F.col("event_type"),
                F.lit("_"),
                F.date_format("ts", "yyyy-MM-dd-HH-mm"),
                F.lit("_"),
                F.expr(f"user_id DIV {10 * n_users}").cast("string"),
            ).alias("dst"),
        )

    def job_wl():
        # 2-round WL refinement: per-round cost = one edge join + one
        # combinable digest agg; color cardinality rides nodes
        from chronographer_spark.operators.graph_algos import wl_colors

        edges = _typed_minute_edges()
        nodes = (
            edges.select(F.col("src").alias("node"))
            .unionByName(edges.select(F.col("dst").alias("node")))
            .distinct()
        )
        labels = nodes.select("node", F.substring("node", 1, 1).alias("label"))
        out = (
            wl_colors(edges, labels, rounds=2)
            .groupBy("color")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        agg = out.agg(F.count(F.lit(1)).alias("k"), F.sum("n").alias("s")).first()
        assert agg["s"] > 0
        return agg["k"]

    def job_ra():
        # wedges generate inside minute buckets (bounded occupancy), so
        # candidate pairs ride the edge count, not users²
        from chronographer_spark.operators.graph_algos import resource_allocation

        out = resource_allocation(_typed_minute_edges(), min_common=1)
        agg = out.agg(
            F.count(F.lit(1)).alias("n"), F.sum("ra_x1e6").alias("s")
        ).first()
        assert agg["n"] > 0
        return agg["n"]

    def job_ks():
        # replicas repeat the same values, so the collapsed distinct-value
        # table (and the whole prefix-sum stage) is repl-INVARIANT; only
        # the count scan rides repl
        from chronographer_spark.operators.temporal import ks_two_sample

        scaled = F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("long")
        a = ev_r.filter(F.col("event_id") % 2 == 0).select(scaled.alias("v"))
        b = ev_r.filter(F.col("event_id") % 2 == 1).select(
            (scaled + F.lit(25000000)).alias("v")
        )
        row = ks_two_sample(a, b, "v", n_parts=4 * CPUS).first()
        assert row.d_num > 0
        return int(row.ks_x1e6)

    def job_perc():
        # ONE CC run over 4 nested keep rates of the replicated
        # user<->type star (type hubs ride repl); CC rounds stay O(log)
        from chronographer_spark.linking.canonicalize import connected_components

        base = ev_r.select(
            F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("a"),
            F.concat(F.lit("t"), F.col("event_type")).alias("b"),
        ).distinct()
        h = (
            F.conv(
                F.substring(F.md5(F.concat_ws("#", "a", "b")), 1, 8), 16, 10
            ).cast("long")
            % 100
        )
        rates = F.array(F.lit(100), F.lit(50), F.lit(25))
        fan = (
            base.withColumn("h", h)
            .select("a", "b", "h", F.explode(rates).alias("rate"))
            .filter(F.col("h") < F.col("rate"))
        )
        pref = lambda r, c: F.concat_ws("|", F.col(r).cast("string"), F.col(c))
        edges = fan.select(
            pref("rate", "a").alias("src"), pref("rate", "b").alias("dst")
        )
        cc = connected_components(edges)
        agg = cc.groupBy(
            F.split("node", r"\|").getItem(0).alias("rate")
        ).agg(F.countDistinct("component").alias("k"))
        rows = {r["rate"]: r["k"] for r in agg.collect()}
        assert rows["100"] >= 1
        return sum(rows.values())

    def job_seasanom():
        # bounded cell cardinality (5 types x 168 cells); medians run on
        # per-cell day lists that ride repl only through count values
        from chronographer_spark.operators.temporal import seasonal_anomaly_report

        out = seasonal_anomaly_report(ev_r, "event_type", "ts", k_mad=3)
        agg = out.agg(
            F.count(F.lit(1)).alias("n"), F.sum("n_anom").alias("s")
        ).first()
        assert agg["n"] > 0
        return agg["n"]

    def job_w1():
        # same repl-invariant collapsed-value-table shape as ks. UNIT
        # buckets, not the x1e6 grid: w1_num <= n_a*n_b*range and at 30x
        # (n ~ 9M per side) the fine grid's range 1e9 overflows BIGINT —
        # exactly the documented headroom contract (coarsen the grid or
        # lift to DECIMAL); the staged final quotient then stays exact
        from chronographer_spark.operators.temporal import wasserstein_two_sample

        bucket = F.floor(F.col("value")).cast("long")
        a = ev_r.filter(F.col("event_id") % 2 == 0).select(bucket.alias("v"))
        b = ev_r.filter(F.col("event_id") % 2 == 1).select(
            (bucket + F.lit(25)).alias("v")
        )
        row = wasserstein_two_sample(a, b, "v", n_parts=4 * CPUS).first()
        assert row.w1_x1e6 > 0
        return int(row.w1_x1e6)

    def job_stress():
        # 2-round BFS from 2 type-node landmarks over the replicated
        # user<->type star: frontier and sigma sums ride repl, the
        # backward chi pass runs on the settled table only
        from chronographer_spark.operators.graph_algos import landmark_stress

        edges = ev_r.select(
            F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("src"),
            F.concat(F.lit("t"), F.col("event_type")).alias("dst"),
        )
        lms = spark.createDataFrame([("tclick",), ("tview",)], ["node"])
        out = landmark_stress(edges, lms, rounds=2)
        agg = out.agg(
            F.count(F.lit(1)).alias("n"), F.sum("stress").alias("s")
        ).first()
        assert agg["s"] > 0
        return agg["n"]

    def job_densest():
        # 2 peel rounds over the replicated star: per-round degree agg +
        # broadcast integer threshold + two semi-joins
        from chronographer_spark.operators.graph_algos import densest_subgraph

        edges = ev_r.select(
            F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("src"),
            F.concat(F.lit("t"), F.col("event_type")).alias("dst"),
        )
        out = densest_subgraph(edges, rounds=2)
        rows = out.collect()
        assert rows[0]["n_edges"] > 0
        return int(rows[0]["n_edges"])

    def job_theilsen():
        # pair fan is C(n_days, 2) per type — calendar-bounded; only the
        # (key, day) count scan rides repl
        from chronographer_spark.operators.temporal import theilsen_trend

        out = theilsen_trend(ev_r, "event_type", "ts", "day")
        agg = out.agg(
            F.count(F.lit(1)).alias("n"), F.sum("n_pairs").alias("s")
        ).first()
        assert agg["s"] > 0
        return agg["n"]

    def job_mst():
        # Boruvka spanning forest over the weighted user/type-hour
        # bipartite graph: rounds = O(log V); per round 2 comp joins +
        # min-of-struct agg + pointer jumps on the (halving) comp table.
        # Weights made unique-enough by a hash tie-break (struct-min's
        # (w,u,v) order is a total order regardless).
        from chronographer_spark.operators.graph_algos import boruvka_mst

        edges = (
            ev_r.select(
                F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("u"),
                F.concat(
                    F.lit("t"),
                    F.col("event_type"),
                    F.lit("#"),
                    F.hour("ts").cast("string"),
                ).alias("v"),
            )
            .groupBy("u", "v")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(
                "u",
                "v",
                (
                    F.expr("CAST(1000000 AS BIGINT) DIV cnt") * 100000
                    + F.pmod(F.xxhash64("u", "v"), F.lit(100000))
                ).alias("w"),
            )
        )
        out = boruvka_mst(edges)
        agg = out.agg(
            F.count(F.lit(1)).alias("n"), F.sum("w").alias("s")
        ).first()
        assert agg["s"] > 0
        return agg["n"]

    def job_katz():
        # 3 weighted join+agg rounds over the user->type digraph
        from chronographer_spark.operators.graph_algos import katz_unrolled

        edges = (
            ev_r.select(
                F.concat(F.lit("u"), F.col("user_id").cast("string")).alias(
                    "src"
                ),
                F.concat(F.lit("t"), F.col("event_type")).alias("dst"),
            )
            .groupBy("src", "dst")
            .agg(F.count(F.lit(1)).alias("nt"))
        )
        out = katz_unrolled(edges, rounds=3, weight_col="nt")
        agg = out.agg(
            F.count(F.lit(1)).alias("n"), F.sum("katz_scaled").alias("s")
        ).first()
        assert agg["s"] > 0
        return agg["n"]

    def job_auc():
        # collapsed distinct-value table is repl-INVARIANT (same value
        # grid per replica) — only the count scan rides repl, like ks
        from chronographer_spark.operators.classifier import auc_exact

        scored = ev_r.select(
            F.floor(F.col("value").cast("double") * 100 + F.lit(0.5))
            .cast("long")
            .alias("score"),
            (F.col("event_type") == "purchase").alias("label"),
        )
        r = auc_exact(scored).collect()[0]
        assert r["u2"] > 0
        return int(r["auc_x1e6"])

    jobs = [
        ("mst", job_mst),
        ("katz", job_katz),
        ("auc", job_auc),
        ("wl", job_wl),
        ("ra", job_ra),
        ("ks", job_ks),
        ("perc", job_perc),
        ("seasanom", job_seasanom),
        ("w1", job_w1),
        ("stress", job_stress),
        ("densest", job_densest),
        ("theilsen", job_theilsen),
        ("pack", job_pack),
        ("bpe", job_bpe),
        ("repetition", job_repetition),
        ("corpus_overlap", job_corpus_overlap),
        ("prefix_jaccard", job_prefix_jaccard),
        ("k_core", job_k_core),
        ("allen", job_allen),
        ("dialogue", job_dialogue),
        ("walks", job_walks),
        ("negatives", job_negatives),
        ("metapath", job_metapath),
        ("comention", job_comention),
        ("typicality", job_typicality),
        ("topic", job_topic),
        ("repeated_spans", job_repeated_spans),
        ("cms_heavy", job_cms_heavy),
        ("bloom_pass", job_bloom_pass),
        ("pq_encode", job_pq_encode),
        ("triangles", job_triangles),
        ("hyperball", job_hyperball),
        ("bfs", job_bfs),
        ("ppr", job_ppr),
        ("luby", job_luby),
        ("lcc", job_lcc),
        ("boilerplate", job_boilerplate),
        ("span_rewrite", job_span_rewrite),
        ("cdc", job_cdc),
        ("kcenter", job_kcenter),
        ("rdfs_naive", job_rdfs_naive),
        ("rdfs_semi", job_rdfs_semi),
        ("scd2", job_scd2),
        ("blocked_er", job_blocked_er),
        ("textrank", job_textrank),
        ("ktruss", job_ktruss),
        ("er_fuse", job_er_fuse),
        ("transe", job_transe),
        ("gazetteer", job_gazetteer),
        ("snowball", job_snowball),
        ("classifier", job_classifier),
        ("ssl", job_ssl),
        ("subclass", job_subclass),
        ("scc", job_scc),
        ("sssp", job_sssp),
        ("truth", job_truth),
        ("kanon", job_kanon),
        ("ind", job_ind),
        ("subseq", job_subseq),
        ("cusum", job_cusum),
        ("acf", job_acf),
        ("cohort", job_cohort),
        ("copurchase", job_copurchase),
        ("featprop", job_featprop),
        ("snm_lev", job_snm_lev),
        ("novelty", job_novelty),
        ("spearman", job_spearman),
        ("dbscan", job_dbscan),
        ("viterbi", job_viterbi),
        ("stump", job_stump),
        ("wis", job_wis),
        ("permtest", job_permtest),
        ("corrmatrix", job_corrmatrix),
        ("attribution", job_attribution),
        ("burst", job_burst),
        ("peak", job_peak),
    ]
    only = set(sys.argv[3:])
    for name, fn in jobs:
        if only and name not in only:
            continue
        times, out = [], None
        for _ in range(reps):
            t0 = time.time()
            out = fn()
            times.append(round(time.time() - t0, 2))
        print(
            json.dumps(
                {
                    "job": name,
                    "repl": repl,
                    "rows_out": out,
                    "times_sec": times,
                    "min_sec": min(times),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
