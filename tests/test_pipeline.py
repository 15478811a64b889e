"""End-to-end corpus-preparation pipeline: the operators compose.

The realistic LLM training-data flow a user of this engine runs — exact
dedup -> near-dup drop list (MinHash+LSH cascade) -> exact-substring span
excision -> boilerplate (segment) removal -> quality filter -> sequence
packing — chained as one lazy DataFrame program over the driver testdata.
Guards the cross-operator contracts (column names, id propagation,
determinism) that per-operator tests can't see.
"""

from pyspark.sql import functions as F

from ctcityscraper_spark.operators.corpus import (
    BPE_SPLIT_RE,
    cut_duplicate_spans,
    duplicate_substring_spans,
    pack_sequences,
    remove_boilerplate,
)
from ctcityscraper_spark.operators.dedup import (
    cascade_confirmed_pairs,
    exact_duplicates,
)
from ctcityscraper_spark.operators.text import quality_score_col
from ctcityscraper_spark.plans.tables import load_table, parallelize_scan

SF = "/root/testdata/sf0.001"


def _prepare(spark):
    docs = parallelize_scan(load_table(spark, SF, "documents"), spark).select(
        "doc_id", "text"
    )

    # 1. exact dedup: keep the lowest doc_id of each identical-text group
    keep_ids = exact_duplicates(docs).select(F.col("keep_id").alias("doc_id"))
    exact_kept = docs.join(keep_ids, "doc_id", "left_semi")

    # 2. near-dup drop list: cascade-confirmed pairs, drop the higher id
    pairs = cascade_confirmed_pairs(exact_kept, k=16, bands=8, n=5, threshold=0.6)
    drops = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    near_kept = exact_kept.join(drops, "doc_id", "left_anti")

    # 3. residual duplicated spans: detect (hash path) and excise
    spans = duplicate_substring_spans(near_kept, width=20, bucket_by_hash=True)
    cut = cut_duplicate_spans(near_kept, spans).select(
        "doc_id", F.col("clean_text").alias("text")
    )

    # 4. boilerplate segment removal
    clean = remove_boilerplate(cut).select(
        "doc_id", F.col("clean_text").alias("text")
    )

    # 5. quality filter
    filtered = clean.filter(quality_score_col("text") > 0.3).filter(
        F.length("text") > 0
    )

    # 6. pack into fixed-length training sequences
    packed = pack_sequences(filtered, seq_len=64, num_shards=4)
    return exact_kept, near_kept, cut, filtered, packed


class TestCorpusPipeline:
    def test_end_to_end_invariants(self, spark):
        exact_kept, near_kept, cut, filtered, packed = _prepare(spark)

        n_exact, n_near, n_filtered = (
            exact_kept.count(), near_kept.count(), filtered.count()
        )
        assert n_exact >= n_near >= n_filtered > 0

        # span excision never grows a document
        grown = (
            cut.alias("c")
            .join(near_kept.alias("n"), "doc_id")
            .filter(F.length("c.text") > F.length("n.text"))
            .count()
        )
        assert grown == 0

        # packing conserves tokens: the pack map covers exactly the
        # filtered docs' token budget (same BPE-ish pre-tokenizer count)
        doc_tokens = filtered.select(
            F.sum(
                F.size(F.regexp_extract_all("text", F.lit(BPE_SPLIT_RE), 0))
            ).alias("n")
        ).first()["n"]
        packed_tokens = packed.select(F.sum("n_tokens").alias("n")).first()["n"]
        assert packed_tokens == doc_tokens

        # every packed doc survived filtering (id propagation intact)
        orphans = packed.join(filtered, "doc_id", "left_anti").count()
        assert orphans == 0

    def test_span_cut_reduces_duplication(self, spark):
        """Cutting detected spans must strictly reduce cross-document
        duplication on this corpus (each duplicated span keeps exactly
        its lowest-id occurrence)."""
        docs = parallelize_scan(load_table(spark, SF, "documents"), spark).select(
            "doc_id", "text"
        )
        before = duplicate_substring_spans(docs, width=20, bucket_by_hash=True)
        n_before = before.count()
        cleaned = cut_duplicate_spans(docs, before).select(
            "doc_id", F.col("clean_text").alias("text")
        )
        n_after = duplicate_substring_spans(
            cleaned, width=20, bucket_by_hash=True
        ).count()
        assert n_before > 0
        assert n_after < n_before

    def test_pipeline_is_deterministic(self, spark):
        _, _, _, _, packed1 = _prepare(spark)
        _, _, _, _, packed2 = _prepare(spark)
        cols = ["shard_id", "pack_id", "doc_id", "offset_in_pack", "n_tokens"]
        a = sorted(map(tuple, packed1.select(*cols).collect()))
        b = sorted(map(tuple, packed2.select(*cols).collect()))
        assert a == b and len(a) > 0
