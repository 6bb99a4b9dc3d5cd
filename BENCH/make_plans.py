"""Generate BENCH/PLANS.md: the physical plans of the headline operators
with commentary — the evidence that filters push down, columns prune,
joins broadcast, and the hot path stays in whole-stage codegen."""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def plan_of(df) -> str:
    p = df._jdf.queryExecution().executedPlan().toString()
    # compress giant regex/literal blobs for readability
    p = re.sub(r"RLIKE\([^)]{40,}?\)\)*", "RLIKE(<pattern>)", p)
    lines = []
    for ln in p.splitlines():
        lines.append(ln if len(ln) < 160 else ln[:157] + "...")
    return "\n".join(lines[:40])


def main() -> None:
    from pyspark.sql import functions as F

    from quality_filter.pipeline import clean_pipeline, reassemble
    from quality_filter.scoring import with_scores
    from quality_filter.session import get_spark

    spark = get_spark("plans", cores=4)
    df = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    from quality_filter.entry_queries import derive_turns

    turns = derive_turns(spark, "/root/testdata/sf0.01")

    sections = []

    narrow = df.select("doc_id").filter("doc_id < 100")
    sections.append((
        "Column pruning + predicate pushdown (any scan)",
        "The parquet scan reads only `doc_id` and ships the predicate to "
        "row groups (`PushedFilters`, `ReadSchema`).",
        "\n".join(l for l in plan_of(narrow).splitlines() if "FileScan" in l or "PushedFilters" in l),
    ))

    headline = with_scores(
        clean_pipeline(turns, mode="filter", labels_to_remove="all", strategy="window")
    )
    sections.append((
        "Headline clean pipeline (filter-all)",
        "One narrow stage scan→prefilter→score→scrub (the "
        "empty-conversation gate is provably elided in remove-all mode), "
        "ArrowEvalPython once (fused langid+perplexity), everything else "
        "inside WholeStageCodegen.  The single RoundRobin Exchange under "
        "the turn derivation is the r9 scale-adaptive scan spread — it "
        "fires only because this sample reads the one-row-group testdata "
        "parquet; the bench headline's 64-split transcript input takes "
        "the no-op branch and keeps ZERO exchanges.",
        plan_of(headline),
    ))

    doc = reassemble(
        clean_pipeline(turns, mode="filter", labels_to_remove="all"), "scrubbed_text"
    )
    sections.append((
        "Reassembly",
        "Single hash aggregate on conv_id; ordering happens inside each "
        "group via array_sort — no global sort, no window.",
        plan_of(doc),
    ))

    from quality_filter.entry_queries import QUERIES

    mh = QUERIES["minhash_candidates"](spark, "/root/testdata/sf0.01")
    mh.count()  # finalize the AQE plan
    sections.append((
        "MinHash+LSH candidates (banded equi-join)",
        "Exploded-band layout: the band-collision join is a HASH join on "
        "(band, band_hash) — never a BroadcastNestedLoopJoin.  At scale "
        "the broadcast side outgrows the threshold and AQE plans a "
        "shuffled hash join on the same keys; shuffle volume scales with "
        "band-bucket occupancy, not |corpus|².",
        "\n".join(
            l for l in plan_of(mh).splitlines()
            if any(k in l for k in ("Join", "Exchange", "Aggregate", "Generate"))
        ),
    ))

    ann = QUERIES["ann_cosine_top5"](spark, "/root/testdata/sf0.01")
    ann.count()
    sections.append((
        "ANN cosine top-k (brute force, broadcast query side)",
        "The tiny query set is broadcast; the corpus side never shuffles "
        "for the join — one Exchange only for the per-query top-k window.",
        "\n".join(
            l for l in plan_of(ann).splitlines()
            if any(k in l for k in ("Join", "Exchange", "Window", "Scan"))
        ),
    ))

    lang = QUERIES["salvage_langid_e2e"](spark, "/root/testdata/sf0.01")
    lang.count()
    sections.append((
        "Salvage end-to-end (document_lang, window strategy)",
        "Per-conversation dominant language in ONE linear pass: the langid "
        "pandas UDF appears exactly once (agg_join would evaluate it once "
        "per join branch); mass summed over (conv_id, lang), argmax over "
        "conv_id.  The agg_join strategy (max_by groupBys + broadcast "
        "join) remains available for skewed conversations over cheap "
        "scans — see pipeline.with_document_lang.",
        "\n".join(
            l for l in plan_of(lang).splitlines()
            if any(k in l for k in ("Join", "Exchange", "Window", "Aggregate", "ArrowEval"))
        ),
    ))

    ivf = QUERIES["ann_ivf_top5"](spark, "/root/testdata/sf0.01")
    ivf.count()
    sections.append((
        "IVF ANN top-k (KMeans cells, centroid literals)",
        "Corpus vectors join their cell id against the broadcast probed "
        "query cells — an EQUI-join on cid; centroid assignment is a "
        "narrow projection (centroids folded into the plan as literals, "
        "no model broadcast, no UDF).  Shuffle scales with cell occupancy "
        "× nprobe, not |corpus|×|queries|.",
        "\n".join(
            l for l in plan_of(ivf).splitlines()
            if any(k in l for k in ("Join", "Exchange", "Window", "Scan"))
        ),
    ))

    rep = QUERIES["repetition_stats"](spark, "/root/testdata/sf0.01")
    rep.count()
    sections.append((
        "Repetition quality signals (Gopher-style)",
        "One explode → partial-aggregated (doc, n, gram) counts → per-doc "
        "aggregate: both HashAggregates are map-side combinable, so the "
        "shuffle carries one row per distinct gram, then one per doc.",
        "\n".join(
            l for l in plan_of(rep).splitlines()
            if any(k in l for k in ("Join", "Exchange", "Aggregate", "Generate"))
        ),
    ))

    conv = QUERIES["dedup_convs_exact"](spark, "/root/testdata/sf0.01")
    conv.count()
    sections.append((
        "Conversation-grain dedup (salted fingerprint)",
        "Two bounded HashAggregates — (conv_id, segment) then conv_id — "
        "hash ordered segment digests instead of materializing the joined "
        "conversation string; the skewed 10^7-turn conversation never "
        "exists as one value.",
        "\n".join(
            l for l in plan_of(conv).splitlines()
            if any(k in l for k in ("Exchange", "Aggregate"))
        ),
    ))

    # one propagation iteration of connected components (the full query
    # is iterative with localCheckpoint lineage cuts, so the converged
    # DataFrame's plan shows only scans — the per-iteration plan is the
    # evidence that matters)
    edges = QUERIES["minhash_candidates"](spark, "/root/testdata/sf0.01")
    und = edges.select(F.col("a").alias("_s"), F.col("b").alias("_d")).union(
        edges.select(F.col("b").alias("_s"), F.col("a").alias("_d"))
    ).distinct().localCheckpoint()
    labels = df.select(
        F.col("doc_id").alias("_v"), F.col("doc_id").alias("_lbl")
    ).localCheckpoint()
    it = (
        labels.union(
            und.join(labels, und["_s"] == labels["_v"]).select(
                F.col("_d").alias("_v"), F.col("_lbl")
            )
        )
        .groupBy("_v")
        .agg(F.min("_lbl").alias("_lbl"))
    )
    it.count()
    sections.append((
        "Near-dup clustering — one propagation iteration",
        "Each connected-components round is one edge⋈label equi-join plus "
        "one map-side-combinable min aggregate; lineage is cut per round "
        "with localCheckpoint so the plan stays this size regardless of "
        "iteration count (which is bounded by component diameter — tiny "
        "for LSH near-clique graphs).",
        "\n".join(
            l for l in plan_of(it).splitlines()
            if any(k in l for k in ("Join", "Exchange", "Aggregate", "Scan"))
        ),
    ))

    dec = QUERIES["decontaminate_docs"](spark, "/root/testdata/sf0.01")
    dec.count()
    sections.append((
        "Test-set decontamination (broadcast benchmark grams)",
        "The benchmark gram set is BROADCAST — the training corpus' gram "
        "stream is probed map-side, never shuffled for the join; the only "
        "exchanges are the per-doc distinct/count aggregates.",
        "\n".join(
            l for l in plan_of(dec).splitlines()
            if any(k in l for k in ("Join", "Exchange", "Aggregate", "Generate"))
        ),
    ))

    pk = QUERIES["pack_sequences"](spark, "/root/testdata/sf0.01")
    pk.count()
    sections.append((
        "Sequence packing (two-phase prefix sum)",
        "The per-shard window partitions by _shard (bounded tasks); the "
        "only partition-less window runs over the shard-totals table "
        "(#shards rows, not #docs) and its base offsets come back via a "
        "BROADCAST join — no single-task scan of the corpus.",
        "\n".join(
            l for l in plan_of(pk).splitlines()
            if any(k in l for k in ("Join", "Exchange", "Window", "Aggregate", "Scan"))
        ),
    ))

    sub = QUERIES["substring_dedup_docs"](spark, "/root/testdata/sf0.01")
    sub.count()
    sections.append((
        "Exact-substring span dedup",
        "Canonical-occurrence selection is a map-side-combinable "
        "min(struct) HashAggregate keyed on the gram hash — no per-gram "
        "window, so a boilerplate gram with millions of occurrences "
        "reduces in the combiner; the occurrence⋈gram-info join and the "
        "marked-position anti-join are both hash joins on their keys.",
        "\n".join(
            l for l in plan_of(sub).splitlines()
            if any(k in l for k in ("Join", "Exchange", "Aggregate", "Generate"))
        ),
    ))

    from quality_filter.cluster import _large_star, _small_star

    e0 = edges.select(F.col("a").alias("_a"), F.col("b").alias("_b")).localCheckpoint()
    star_round = _small_star(_large_star(e0))
    star_round.count()
    sections.append((
        "Star-components round (large-star ∘ small-star)",
        "One alternating round of the O(log² n) algorithm: two "
        "join+groupBy pairs, each a hash aggregate + hash join on the "
        "node id — per-round cost independent of component diameter "
        "(the escape hatch when a near-dup graph ever grows long chains).",
        "\n".join(
            l for l in plan_of(star_round).splitlines()
            if any(k in l for k in ("Join", "Exchange", "Aggregate"))
        ),
    ))

    ev = QUERIES["eval_report"](spark, "/root/testdata/sf0.01")
    ev.count()
    sections.append((
        "Training-eval report (per-class P/R/F1)",
        "Everything reduces through one map-side-combinable "
        "groupBy(label, prediction) — the confusion matrix is ≤|classes|² "
        "rows regardless of corpus size; the per-class report is a "
        "full-outer join of two aggregates OVER THAT TINY TABLE, so every "
        "exchange after the first carries class-count rows, never corpus "
        "rows.",
        "\n".join(
            l for l in plan_of(ev).splitlines()
            if any(k in l for k in ("Join", "Exchange", "Aggregate"))
        ),
    ))

    mm = QUERIES["multimodal_features"](spark, "/root/testdata/sf0.01")
    mm.count()
    sections.append((
        "Multimodal feature extraction (mapInPandas decode)",
        "Partition-preserving: payload synthesis and codec decode are two "
        "chained MapInPandas operators with NO exchange between scan and "
        "output — binary columns never shuffle; the feature projection is "
        "narrow.",
        "\n".join(
            l for l in plan_of(mm).splitlines()
            if any(k in l for k in ("MapInPandas", "Exchange", "Scan", "Project"))
        ),
    ))

    from quality_filter.dedup import exact_jaccard_for_pairs

    pr = edges.select("a", "b")
    ej = exact_jaccard_for_pairs(df, pr)
    ej.count()
    sections.append((
        "Exact-Jaccard verify layer (pair-scoped shingling)",
        "Only docs appearing in some candidate pair are shingled (the "
        "left-semi join against the pair id set runs BEFORE the explode), "
        "and the intersection count joins pair×shingle streams on "
        "(doc, shingle) equi-keys — work scales with Σ|shingles(candidate "
        "docs)|, never with the corpus.",
        "\n".join(
            l for l in plan_of(ej).splitlines()
            if any(k in l for k in ("Join", "Exchange", "Aggregate", "Generate"))
        ),
    ))

    from quality_filter.sampling import mixture_resample

    mix = mixture_resample(
        df.select("doc_id", "source"),
        {"src0": 400, "src1": 300, "src2": 200, "src3": 100},
        budget_pm=100,
    )
    mix.count()
    sections.append((
        "Domain-mixture resample (one-pass thresholds)",
        "ONE corpus scan total: the per-domain count aggregate feeds "
        "driver-side exact-integer threshold arithmetic (bounded domain "
        "vocabulary, guarded), and selection is a BROADCAST join of the "
        "literal rates table + a narrow filter — the plan contains no "
        "second scan and no corpus shuffle.",
        "\n".join(
            l for l in plan_of(mix).splitlines()
            if any(k in l for k in ("Join", "Exchange", "Aggregate", "Scan", "Filter"))
        ),
    ))

    from quality_filter.similarity import embedding_near_dups

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    sem_pairs = embedding_near_dups(emb, threshold=0.95)
    sem_pairs.count()
    sections.append((
        "Semantic dedup — SRP-LSH pair stage (scale path)",
        "The SemDeDup pipeline's quadratic half is bucketed: candidate "
        "pairs come from an EQUI-join on (table, bucket) over the "
        "sign-random-projection ids (hyperplanes folded into the plan as "
        "literals — no model broadcast, no UDF), then exact cosine "
        "verifies only candidates.  Cross-band collision dedup runs on "
        "bare (a, b) id pairs — embedding arrays re-attach AFTER the "
        "distinct, so the widest shuffle carries ids, not vectors "
        "(similarly for lsh_ann_topk's query/corpus re-attach).  "
        "Downstream clustering reuses the connected-components round "
        "shown above.",
        "\n".join(
            l for l in plan_of(sem_pairs).splitlines()
            if any(k in l for k in ("Join", "Exchange", "Aggregate", "Generate"))
        ),
    ))

    from quality_filter.dedup import lsh_candidates, minhash_signatures

    body = " ".join(f"w{i % 7}x{i % 11}" for i in range(60))
    degen = spark.createDataFrame(
        [(i, f"{body} uniq{i}") for i in range(300)], "doc_id long, text string"
    )
    sig = minhash_signatures(degen)
    capped_cand = lsh_candidates(sig, max_bucket_size=50)
    capped_cand.count()
    sections.append((
        "LSH bucket-occupancy guard (capped single-lineage pair shape)",
        "With a cap set, candidate pairs come from ONE lineage pass and "
        "NO self-join: a (key)-shuffled row_number cap (map-side "
        "WindowGroupLimit prunes oversized buckets before the exchange), "
        "a per-bucket collect_list whose memory is bounded by the cap, "
        "and a positional double-explode of the sorted member array — "
        "O(bands·cap²) pairs on this degenerate 300-near-identical-doc "
        "corpus instead of O(k²), with the banded table computed exactly "
        "once.  Uncapped (max_bucket_size=None — the oracle-checked "
        "default in the registered queries) retains the banded "
        "equi-self-join, where an unbounded collect_list would be an OOM "
        "hazard; pair-set parity between the strategies is pinned by "
        "tests/test_round6.py.",
        "\n".join(
            l for l in plan_of(capped_cand).splitlines()
            if any(k in l for k in ("Join", "Exchange", "Window", "Aggregate", "Union"))
        ),
    ))

    from quality_filter.textstats import c4_line_filter, with_gopher_flags

    doc_sample = spark.createDataFrame(
        [(1, "a fine line with five words.\nshort one\nanother good line ends well!")],
        "doc_id long, text string",
    )
    c4 = c4_line_filter(doc_sample)
    gopher = with_gopher_flags(doc_sample)
    sections.append((
        "C4 line filter + Gopher flags (scan-shaped text gates)",
        "Both corpus gates are single narrow projections built from array "
        "HOFs — ZERO exchanges (asserted by tests/test_gopher_c4.py): the "
        "per-line keep rule and every Gopher metric evaluate inside one "
        "map over the text column, so at 100 TB they cost one scan and "
        "parallelize embarrassingly.  The explode→filter→groupBy "
        "alternative would shuffle the full corpus twice for identical "
        "output.",
        plan_of(c4) + "\n--- gopher ---\n" + plan_of(gopher),
    ))

    from quality_filter.textstats import tfidf_top_terms

    tfidf = tfidf_top_terms(df.withColumn("source", F.lit("s")), k=3)
    sections.append((
        "TF-IDF top terms (combinable aggregates + broadcast count)",
        "Three aggregates and one window, all in their cheapest shapes: "
        "the doc-term count and the df count are partial_count hash "
        "aggregates (map-side combinable — the exploded word stream "
        "combines before its exchange), the one-row corpus count joins "
        "via BroadcastExchange (never a shuffle), and the top-k window "
        "partitions on the group key so its sort touches per-group "
        "vocabulary, not the corpus.",
        "\n".join(
            l for l in plan_of(tfidf).splitlines()
            if any(k in l for k in ("Aggregate", "Exchange", "Window", "Join", "Generate"))
        ),
    ))

    # ---- round-7 shapes -------------------------------------------------
    from quality_filter.dedup import exact_dedup

    exd = exact_dedup(df.select("doc_id", "text"))
    exd.count()
    sections.append((
        "Exact dedup (single-scan min_by keeper, r7)",
        "ONE scan and ONE shuffle: min_by(struct(row), id) per text "
        "fingerprint — partial_min_by combines map-side, so k identical "
        "copies collapse to one surviving candidate per mapper before "
        "the exchange (the pre-r7 groupBy-ids + left-semi-join shape "
        "scanned the upstream twice and shuffled twice).",
        "\n".join(
            l for l in plan_of(exd).splitlines()
            if any(k in l for k in ("Aggregate", "Exchange", "Scan", "Project"))
        ),
    ))

    from quality_filter.corpus import build_pretrain_corpus

    built = build_pretrain_corpus(df.select("doc_id", "text"))
    built.count()
    sections.append((
        "Composed corpus build (fused Arrow gates → staged dedup, r7/r8)",
        "The C4 line clean + both Gopher gate verdicts come from ONE "
        "MapInPandas node (r8: Arrow-compute batch kernel, 2.07× the r7 "
        "row kernel — BENCH/r8_gates_ab.json; the interpreted HOF chain "
        "measured 5.4× the row kernel); uniq/sig materialize once behind "
        "localCheckpoint scans, so the gate stage is executed once per "
        "build instead of once per downstream consumer.  The connected-"
        "components loop iterates only the edge-touched subgraph (r8) "
        "with its convergence signature riding the checkpoint job via "
        "observe.  Every join downstream is a hash join on an id or "
        "band key.",
        "\n".join(
            l for l in plan_of(built).splitlines()
            if any(k in l for k in (
                "MapInPandas", "Join", "Exchange", "Aggregate", "Checkpoint",
                "Scan",
            ))
        ),
    ))

    from quality_filter.curation import cap_per_key

    capped = cap_per_key(
        df.select(
            "doc_id",
            F.pmod(F.col("doc_id"), F.lit(5)).cast("string").alias("source"),
            "text",
        ),
        "source", 10, order_col="doc_id",
    )
    capped.count()
    sections.append((
        "Per-domain cap (partial WindowGroupLimit, r7)",
        "The rank-limit filter plans as WindowGroupLimit in PARTIAL mode "
        "before the exchange and FINAL mode after — each mapper keeps "
        "only its own top-k per key, so a 10^9-row domain ships "
        "tasks × k rows through the shuffle, never 10^9 into one sort "
        "task.",
        "\n".join(
            l for l in plan_of(capped).splitlines()
            if any(k in l for k in ("WindowGroupLimit", "Window", "Exchange", "Sort"))
        ),
    ))

    from quality_filter.curation import (
        build_decontamination_filter,
        decontaminate_bloom,
    )

    bench = df.filter(F.col("doc_id") % 97 == 0).select("text")
    bits, meta = build_decontamination_filter(bench, n=8)
    bloomed = decontaminate_bloom(
        df.filter(F.col("doc_id") % 97 != 0), bits, meta
    )
    bloomed.count()
    sections.append((
        "Bloom decontamination probe (prime modulus, r8)",
        "Corpus grams hash to k Kirsch-Mitzenmacher positions over a "
        "PRIME modulus (a composite m let a degenerate step probe only "
        "m/gcd distinct bits — a real false positive caught by the r8 "
        "oracle stamp); the bitset joins in as a BROADCAST hash probe on "
        "the 64-bit word index, all JVM-side — no Python workers, no "
        "shuffle of the corpus gram stream before the per-doc aggregate.",
        "\n".join(
            l for l in plan_of(bloomed).splitlines()
            if any(k in l for k in (
                "Broadcast", "Join", "Exchange", "Aggregate", "Generate",
            ))
        ),
    ))

    from quality_filter.teacher import (
        fake_structured_teacher,
        label_lines_with_teacher,
    )

    tlines = turns.select("doc_id", F.col("turn_idx").alias("line_idx"), "text")
    labeled = label_lines_with_teacher(tlines, fake_structured_teacher)
    labeled.count()
    sections.append((
        "Teacher-labeling loop (M2, pluggable generate node, r8)",
        "Two batch/line-grain exchanges (position window + "
        "groupBy((id, batch)) — every materialized row stays "
        "batch-bounded, unlike a one-exchange whole-document "
        "collect_list), ONE MapInPandas node for the generate call, then "
        "pure Catalyst: A7 strip/repair/from_json, posexplode alignment "
        "(no join back), taxonomy coercion.  Zero corpus-grain joins — "
        "at 100 TB the teacher model is the cost, not this plan.",
        "\n".join(
            l for l in plan_of(labeled).splitlines()
            if any(k in l for k in (
                "MapInPandas", "Window", "Exchange", "Aggregate",
                "Generate", "Project",
            ))
        ),
    ))

    out = ["# BENCH/PLANS.md — physical-plan evidence\n"]
    for title, note, plan in sections:
        out += [f"## {title}\n", note + "\n", "```", plan, "```", ""]
    (REPO / "BENCH" / "PLANS.md").write_text("\n".join(out))
    n_exchanges = plan_of(headline).count("Exchange")
    print("headline exchanges:", n_exchanges)
    spark.stop()


if __name__ == "__main__":
    main()
