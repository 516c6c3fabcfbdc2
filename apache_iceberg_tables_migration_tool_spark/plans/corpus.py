"""End-to-end corpus build: the 100 TB training-data story COMPOSED.

Every individual operator this pipeline uses ships (and is
oracle-checked) elsewhere in the repo; this module wires them into
the nightly-crawl shape a pretraining data build actually runs —
iterative, index-backed, and WAP-gated:

1. **Source reputation gate** (`operators.curation.source_reputation`)
   — drop mirror-farm/template sources wholesale before any per-doc
   work (one O(sources) scoreboard pass over the corpus candidates).
2. **Benchmark decontamination** (`operators.curation.contamination`)
   — drop docs sharing ≥ ``min_shared`` word-3-grams with the eval
   slice (benchmark shingle set broadcast; corpus never shuffles).
3. **Iterative ingest with incremental near-dup dedup**
   (`operators.dedup.dedup_batch_against_corpus`): the stream of
   crawl batches lands one at a time; each batch is checked against
   the ACCUMULATED published corpus through the PERSISTED MinHash
   band index (a `SnapCatalog` table partitioned by band) — corpus
   text is never re-read in full, the index is appended per ingest.
4. **Write-audit-publish** per batch: accepted docs land as a STAGED
   snapshot (`SnapCatalog.write(staged=True, wap_id=…)`), an audit
   validates the staged data (no benchmark doc, no id collision with
   the published corpus), then `publish` flips it into the main
   history — a bad batch never becomes visible.
5. **Mixture sampling** (`operators.curation.mixture_sample`) — the
   final fixed-budget training mix drawn from the published corpus by
   portable md5 rank.

Scale shape: stages 1-2 are one scoreboard pass + one broadcast
semi-join; stage 3's per-batch cost is O(batch × bands) candidate
lookups into the persisted index plus a candidate-sized exact verify;
stage 4 is control-plane metadata; stage 5 is one shuffle on the
stratum key. Nothing rescans the accumulated corpus text.

Reference scope note: the reference tool (six migration scripts) has
no curation surface; this composition extends the engine per the
build contract. Its WAP plane mirrors the reference's Iceberg
substrate semantics (staged snapshots ≙ ``spark.wap.id``).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from apache_iceberg_tables_migration_tool_spark.session import pin

from apache_iceberg_tables_migration_tool_spark.operators import curation as C
from apache_iceberg_tables_migration_tool_spark.operators import dedup as D
from apache_iceberg_tables_migration_tool_spark.sources.snapcat import SnapCatalog

#: deterministic commit timeline for reproducible snapshot histories
#: deterministic commit timeline — 28 entries supports up to 13 ingest
#: batches (each consumes two commit stamps)
_T = [f"2024-07-{i:02d}T00:00:00.000000+00:00" for i in range(1, 29)]


@dataclass
class CorpusBuildResult:
    """Artifacts of one corpus build (catalog handle + final mix)."""

    catalog: SnapCatalog
    mixture: DataFrame
    batch_stats: list[dict] = field(default_factory=list)


def build_corpus(
    spark: SparkSession,
    docs: DataFrame,
    warehouse: str,
    *,
    bench_mod: int = 97,
    batches: int = 3,
    min_shared: int = 3,
    min_uniq_ratio: float = 0.42,
    max_dup_rate: float = 0.2,
    threshold: float = 0.5,
    num_hashes: int = 48,
    bands: int = 12,
    seed: int = 42,
    mix_weights: dict[str, int] | None = None,
    mix_budget: int = 200,
    database: str = "corpus",
) -> CorpusBuildResult:
    """Run the full corpus build over ``docs`` into a fresh
    ``SnapCatalog`` warehouse and return the final training mix.

    ``docs`` must carry (doc_id, lang, source, text). The eval slice
    is ``doc_id % bench_mod == 0``; ingest batches split the rest by
    ``doc_id % batches`` and land IN ORDER (batch b is deduped against
    the published union of batches < b — the accumulation semantics of
    a nightly crawl). All knobs are deterministic plan-time constants,
    so the build is replayable relationally (see the oracle of
    ``corpus_build_e2e`` in queries/curation.py).
    """
    if mix_weights is None:
        mix_weights = {"en": 50, "zh": 20, "es": 15, "de": 10, "fr": 5}
    if not 1 <= batches <= len(_T) // 2:
        raise ValueError(
            f"batches must be 1..{len(_T) // 2} (each ingest consumes two "
            f"commit stamps of the deterministic timeline), got {batches}"
        )
    cat = SnapCatalog(warehouse)

    bench = docs.where(F.col("doc_id") % bench_mod == 0)
    cand = docs.where(F.col("doc_id") % bench_mod != 0)

    # Stage 1: source reputation over the full candidate pool (one
    # global scoreboard — per-batch re-scoring would let a mirror farm
    # slip through its first small batch).
    kept_sources = (
        C.source_reputation(
            cand, min_uniq_ratio=min_uniq_ratio, max_dup_rate=max_dup_rate
        )
        .where(F.col("keep"))
        .select("source")
    )
    clean = cand.join(F.broadcast(kept_sources), "source", "left_semi")

    # Stage 2: benchmark decontamination (drop, not just flag).
    contaminated = C.contamination(
        clean, bench, min_shared=min_shared
    ).select("doc_id")
    ok = clean.join(contaminated, "doc_id", "left_anti").select(
        "doc_id", "lang", "source", "text"
    )
    # Gates 1-2 are row-local w.r.t. each batch; pin the gated pool
    # once so the per-batch loop doesn't recompute the reputation
    # scoreboard and the contamination join per iteration.
    ok = ok.transform(pin)

    stats: list[dict] = []
    for b in range(batches):
        batch_docs = ok.where(F.col("doc_id") % batches == b)
        # ONE signature pass per batch: the band rows feed both the
        # dedup candidate join and (filtered to survivors) the
        # persisted index append below — minhash over the batch text
        # is the expensive step, never pay it twice.
        batch_bands = D.band_table(
            batch_docs, num_hashes=num_hashes, bands=bands, seed=seed
        ).transform(pin)
        if b == 0:
            accepted = batch_docs
            accepted_bands = batch_bands
            n_dups = 0
        else:
            tbl = cat.table(database, "docs")
            corpus_docs = tbl.read(spark)
            band_index = cat.table(database, "band_index").read(spark)
            dups = D.dedup_batch_against_corpus(
                batch_docs,
                corpus_docs,
                threshold=threshold,
                num_hashes=num_hashes,
                bands=bands,
                seed=seed,
                corpus_bands=band_index,
                new_bands=batch_bands,
            )
            dup_ids = (
                dups.select(F.col("doc_a").alias("doc_id"))
                .distinct()
                .transform(pin)  # two consumers below
            )
            n_dups = dup_ids.count()
            accepted = batch_docs.join(dup_ids, "doc_id", "left_anti")
            accepted_bands = batch_bands.join(dup_ids, "doc_id", "left_anti")

        payload = accepted.withColumn("ingest_batch", F.lit(b).cast("int"))

        def _wap_chain() -> dict:
            # WAP: stage → audit → publish. The staged snapshot is
            # invisible to normal reads until the audit passes.
            staged = cat.write(
                database, "docs", payload,
                staged=True, wap_id=f"ingest-{b}", committed_at=_T[2 * b],
            )
            tbl = cat.table(database, "docs")
            staged_df = tbl.read(spark, snapshot_id=staged.snapshot_id)
            prev_ids = (
                tbl.read(spark).select("doc_id")
                if b > 0
                else spark.range(0).select(F.col("id").alias("doc_id"))
            )
            # one audit job: benchmark-leak count, id-collision count and
            # the batch's accepted count come from a single pass over the
            # staged snapshot (left join against prior ids replaces the
            # separate semi-join count)
            audit = (
                staged_df.join(
                    prev_ids.withColumn("__prev", F.lit(True)), "doc_id", "left"
                )
                .agg(
                    F.sum(
                        (F.col("doc_id") % bench_mod == 0).cast("long")
                    ).alias("bench"),
                    F.sum(
                        (
                            (F.col("ingest_batch") == b) & F.col("__prev").isNotNull()
                        ).cast("long")
                    ).alias("collisions"),
                    F.sum((F.col("ingest_batch") == b).cast("long")).alias("accepted"),
                )
                .collect()[0]
            )
            audit_bench, audit_dup_ids = audit["bench"], audit["collisions"]
            if audit_bench or audit_dup_ids:
                raise RuntimeError(
                    f"ingest-{b} failed audit: {audit_bench} benchmark docs, "
                    f"{audit_dup_ids} id collisions — staged snapshot "
                    f"{staged.snapshot_id} NOT published"
                )
            cat.publish(database, "docs", staged.snapshot_id, committed_at=_T[2 * b + 1])
            return {"audit": audit, "snapshot_id": staged.snapshot_id}

        def _index_append() -> None:
            # Append the accepted docs' band rows to the persisted index —
            # the next ingest joins against it instead of re-signaturing
            # the corpus (partitioned by band → the candidate join prunes).
            # Reuses the batch's single signature pass (accepted_bands).
            cat.write(
                database, "band_index", accepted_bands,
                mode="append", partition_by=["band"], committed_at=_T[2 * b + 1],
            )

        # The WAP chain (stage → audit → publish, sequenced by WAP
        # semantics) and the band-index append touch DIFFERENT tables
        # and both derive from this batch's pinned relations — run them
        # as two concurrent driver jobs so the index write back-fills
        # the audit/publish chain's scheduling tails (guide §2.6). An
        # audit failure still aborts the build before publish; the
        # index append of the aborted batch is unreachable (nothing
        # reads the index after a failed build).
        with ThreadPoolExecutor(max_workers=2) as pool:
            wap_fut = pool.submit(_wap_chain)
            idx_fut = pool.submit(_index_append)
            wap = wap_fut.result()
            idx_fut.result()
        stats.append(
            {
                "batch": b,
                "accepted": int(wap["audit"]["accepted"]),
                "near_dups_dropped": n_dups,
                "snapshot_id": wap["snapshot_id"],
            }
        )

    final = cat.table(database, "docs").read(spark)
    mixture = C.mixture_sample(final, mix_weights, mix_budget).select(
        "doc_id", "lang", "ingest_batch"
    )
    return CorpusBuildResult(catalog=cat, mixture=mixture, batch_stats=stats)
