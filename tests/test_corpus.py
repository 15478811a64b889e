"""Corpus-preparation operator tests: edge cases the oracle gate can't show
(the catalog queries in plans/queries_corpus.py cover the happy path against
DuckDB; these pin down degenerate inputs and the scale guards)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from ctcityscraper_spark.operators.corpus import (
    duplicate_substring_spans,
    shuffle_shards,
    boilerplate_segments,
    contamination_pairs,
    pii_scrub,
    remove_boilerplate,
    repetition_signals,
    segments,
    stratified_sample,
    train_test_split,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


class TestSegments:
    def test_exact_width_single_segment(self, spark):
        out = segments(_docs(spark, ["a b c d"]), width=4).collect()
        assert [(r.pos, r.segment) for r in out] == [(0, "a b c d")]

    def test_remainder_segment(self, spark):
        out = segments(_docs(spark, ["a b c d e"]), width=4).orderBy("pos").collect()
        assert [(r.pos, r.segment) for r in out] == [(0, "a b c d"), (1, "e")]


class TestRemoveBoilerplate:
    def test_fully_boilerplate_doc_survives_empty(self, spark):
        # "x y z w" appears in 3 docs -> boilerplate; doc 2 is ONLY that
        docs = _docs(
            spark,
            ["x y z w a b c d", "x y z w e f g h", "x y z w"],
        )
        out = {r.doc_id: r for r in remove_boilerplate(docs, min_docs=3).collect()}
        assert len(out) == 3  # every input doc keeps a row
        assert out[2].clean_text == ""
        assert out[2].n_dropped == 1 and out[2].n_segments == 1
        assert out[0].clean_text == "a b c d"

    def test_position_order_preserved(self, spark):
        docs = _docs(
            spark,
            ["p q r s AAA BBB CCC DDD t u v w", "AAA BBB CCC DDD", "AAA BBB CCC DDD"],
        )
        out = {r.doc_id: r for r in remove_boilerplate(docs, min_docs=3).collect()}
        assert out[0].clean_text == "p q r s t u v w"

    def test_hot_set_small(self, spark):
        docs = _docs(spark, ["a b c d unique1", "a b c d unique2", "a b c d unique3"])
        hot = boilerplate_segments(segments(docs), min_docs=3).collect()
        assert [r.segment for r in hot] == ["a b c d"]


class TestRepetitionSignals:
    def test_single_word_doc(self, spark):
        r = repetition_signals(_docs(spark, ["hello"])).first()
        assert r.n_words == 1
        assert r.dup_2gram_frac == 0.0
        assert r.top_word_frac == 1.0

    def test_degenerate_repetition(self, spark):
        r = repetition_signals(_docs(spark, ["spam spam spam spam"])).first()
        assert r.top_word_frac == 1.0
        assert r.distinct_word_frac == 0.25
        assert r.dup_2gram_frac == 1.0 - 1.0 / 3.0

    def test_all_distinct(self, spark):
        r = repetition_signals(_docs(spark, ["a b c d"])).first()
        assert r.distinct_word_frac == 1.0 and r.dup_2gram_frac == 0.0


class TestPiiScrub:
    def test_counts_and_redaction(self, spark):
        df = _docs(
            spark,
            ["mail a@b.co and c.d@e-f.org ip 10.0.0.1 tel +44 20 7946 0958 done"],
        )
        r = pii_scrub(df).first()
        assert (r.n_email, r.n_ipv4, r.n_phone) == (2, 1, 1)
        assert (
            r.redacted == "mail <EMAIL> and <EMAIL> ip <IP> tel <PHONE> done"
        )

    def test_clean_text_untouched(self, spark):
        r = pii_scrub(_docs(spark, ["no pii here at all"])).first()
        assert r.redacted == "no pii here at all"
        assert (r.n_email, r.n_ipv4, r.n_phone) == (0, 0, 0)


class TestStratifiedSample:
    def _frame(self, spark):
        return spark.createDataFrame(
            [Row(doc_id=i, source=f"s{i % 2}") for i in range(200)]
        )

    def test_weight_bounds(self, spark):
        df = self._frame(spark)
        assert stratified_sample(df, {"s0": 0.0, "s1": 0.0}).count() == 0
        assert stratified_sample(df, {"s0": 1.0, "s1": 1.0}).count() == 200

    def test_deterministic_and_stratified(self, spark):
        df = self._frame(spark)
        a = sorted(r.doc_id for r in stratified_sample(df, {"s0": 1.0, "s1": 0.2}).collect())
        b = sorted(r.doc_id for r in stratified_sample(df, {"s0": 1.0, "s1": 0.2}).collect())
        assert a == b
        assert all(i % 2 == 0 or i in b for i in a)  # every kept odd id is from s1
        kept_s1 = [i for i in a if i % 2 == 1]
        assert 0 < len(kept_s1) < 100  # ~20% of the s1 stratum, not 0/all

    def test_default_rate_applies_to_unlisted(self, spark):
        df = self._frame(spark)
        out = stratified_sample(df, {"s0": 1.0}, default_rate=0.0).collect()
        assert all(r.source == "s0" for r in out)


class TestShards:
    def test_write_shards_layout_and_determinism(self, spark, tmp_path):
        from ctcityscraper_spark.operators.corpus import write_shards

        df = spark.createDataFrame(
            [Row(doc_id=i, text=f"doc {i}") for i in range(500)]
        )
        p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
        write_shards(df, p1, n_shards=8)
        write_shards(df, p2, n_shards=8)
        out1 = spark.read.parquet(p1)
        assert out1.select("shard_id").distinct().count() == 8
        assert out1.count() == 500
        # byte-identical re-run: same rows in the same shard order
        a = out1.orderBy("shard_id", "shard_pos").select("doc_id").collect()
        b = spark.read.parquet(p2).orderBy("shard_id", "shard_pos").select("doc_id").collect()
        assert a == b
        # a reproducible permutation, not insertion order
        assert [r.doc_id for r in a[:20]] != list(range(20))

    def test_shards_balanced(self, spark):
        df = spark.createDataFrame([Row(doc_id=i) for i in range(2000)])
        sizes = [
            r.n
            for r in shuffle_shards(df, 16)
            .groupBy("shard_id")
            .agg(F.count("*").alias("n"))
            .collect()
        ]
        assert len(sizes) == 16
        assert max(sizes) < 2 * min(sizes)  # hash-balanced


class TestIncrementalDedup:
    def test_stored_index_matches_recompute_and_cross_only(self, spark):
        from ctcityscraper_spark.operators.dedup import (
            incremental_dedup_pairs,
            lsh_band_index,
        )

        corpus = _docs(spark, [f"c{i} " + "w1 w2 w3 w4 w5 w6 w7 w8" for i in range(4)])
        new = spark.createDataFrame(
            [
                Row(doc_id=100, text="new0 w1 w2 w3 w4 w5 w6 w7 w8"),  # near-dup
                Row(doc_id=101, text="z1 z2 z3 z4 z5 z6 z7 z8 z9"),  # unrelated
            ]
        )
        direct = incremental_dedup_pairs(new, corpus, n=3, threshold=0.5)
        stored = incremental_dedup_pairs(
            new, corpus, corpus_index=lsh_band_index(corpus, n=3), n=3, threshold=0.5
        )
        d = sorted((r.new_doc, r.corpus_doc) for r in direct.collect())
        s = sorted((r.new_doc, r.corpus_doc) for r in stored.collect())
        assert d == s
        assert d, "the planted near-dup must be found"
        assert all(a == 100 for a, _ in d)  # only new-batch docs on the left
        assert all(b < 100 for _, b in d)  # only corpus docs on the right


class TestCorpusProperties:
    """Hypothesis invariants for the corpus operators."""

    SETTINGS = None  # set below to avoid import cost when hypothesis absent

    def test_segment_word_conservation(self, spark):
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        words = st.lists(
            st.text(alphabet="abcdef", min_size=1, max_size=4), min_size=1, max_size=25
        )

        @settings(
            max_examples=10,
            deadline=None,
            suppress_health_check=[HealthCheck.function_scoped_fixture],
        )
        @given(ws=words)
        def inner(ws):
            text = " ".join(ws)
            seg = segments(_docs(spark, [text]), width=4).orderBy("pos").collect()
            # exact segment count and loss-free reassembly in pos order
            assert len(seg) == (len(ws) + 3) // 4
            assert " ".join(r.segment for r in seg) == text

        inner()

    def test_repetition_signal_bounds_and_sample_determinism(self, spark):
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        docs = st.lists(
            st.lists(
                st.text(alphabet="xyz", min_size=1, max_size=3), min_size=1, max_size=15
            ),
            min_size=1,
            max_size=5,
        )

        @settings(
            max_examples=8,
            deadline=None,
            suppress_health_check=[HealthCheck.function_scoped_fixture],
        )
        @given(ds=docs)
        def inner(ds):
            df = _docs(spark, [" ".join(ws) for ws in ds])
            for r in repetition_signals(df).collect():
                assert 0.0 < r.distinct_word_frac <= 1.0
                assert 0.0 < r.top_word_frac <= 1.0
                assert 0.0 <= r.dup_2gram_frac < 1.0
                assert r.n_words == len(ds[r.doc_id])
            sdf = df.withColumn("source", F.lit("s"))
            a = {r.doc_id for r in stratified_sample(sdf, {}, default_rate=0.5).collect()}
            b = {r.doc_id for r in stratified_sample(sdf, {}, default_rate=0.5).collect()}
            assert a == b  # hash sampling is a pure function of ids

        inner()


class TestContamination:
    def test_split_is_deterministic(self, spark):
        df = spark.createDataFrame([Row(doc_id=i) for i in range(1000)])
        frac = train_test_split(df).filter("is_test").count()
        assert 60 < frac < 140  # ~1/10 by hash

    def test_shared_ngram_detected_and_df_cap_guards(self, spark):
        base = "q w e r t y u i o p"  # 10 words -> 3 distinct 8-grams
        texts = [f"{base} tail{i}" for i in range(6)] + ["z " * 9]
        df = _docs(spark, texts)
        pairs = contamination_pairs(df, n=8, test_mod=2, seed="t", df_cap=None)
        assert pairs.count() > 0
        # cap below the shared shingle's frequency removes every candidate
        capped = contamination_pairs(df, n=8, test_mod=2, seed="t", df_cap=2)
        assert capped.count() == 0

    def test_contaminated_train_ids_matches_pair_form(self, spark):
        # the semi-join form used by corpus_e2e_prep must return exactly
        # contamination_pairs(...).select(train_doc).distinct(), for both
        # the capped and uncapped guard
        from ctcityscraper_spark.operators.corpus import contaminated_train_ids

        base = "q w e r t y u i o p"
        texts = [f"{base} tail{i}" for i in range(9)] + ["z " * 9, base * 2]
        df = _docs(spark, texts)
        for cap in (None, 2, 1000):
            want = {
                r.train_doc
                for r in contamination_pairs(
                    df, n=8, test_mod=2, seed="t", df_cap=cap
                )
                .select("train_doc")
                .distinct()
                .collect()
            }
            got = {
                r.doc_id
                for r in contaminated_train_ids(
                    df, n=8, test_mod=2, seed="t", df_cap=cap
                ).collect()
            }
            assert got == want


class TestPackSequences:
    """pack_sequences (operators/corpus.py): concat-then-chunk packing
    invariants — full packs are exactly seq_len, every token lands in
    exactly one pack, spanning docs split across consecutive packs."""

    def _packed(self, spark):
        from ctcityscraper_spark.operators.corpus import pack_sequences

        texts = [f"word{i} " * (30 + 17 * (i % 7)) for i in range(40)]
        df = _docs(spark, texts)
        return df, pack_sequences(df, seq_len=64, num_shards=4)

    def test_full_packs_exact_and_tokens_conserved(self, spark):
        df, packed = self._packed(spark)
        rows = packed.collect()
        # tokens conserved: per-doc contributions sum to the doc's count
        from ctcityscraper_spark.operators.corpus import BPE_SPLIT_RE

        want = {
            r.doc_id: r.n
            for r in df.select(
                "doc_id", F.size(F.regexp_extract_all("text", F.lit(BPE_SPLIT_RE), 0)).alias("n")
            ).collect()
        }
        got = {}
        for r in rows:
            got[r.doc_id] = got.get(r.doc_id, 0) + r.n_tokens
        assert got == {d: n for d, n in want.items() if n > 0}
        # every pack except each shard's last is exactly seq_len tokens
        per_pack, last = {}, {}
        for r in rows:
            per_pack[(r.shard_id, r.pack_id)] = per_pack.get((r.shard_id, r.pack_id), 0) + r.n_tokens
            last[r.shard_id] = max(last.get(r.shard_id, -1), r.pack_id)
        for (shard, pack), n in per_pack.items():
            if pack < last[shard]:
                assert n == 64, (shard, pack, n)
            else:
                assert 0 < n <= 64
        # offsets stay inside the pack
        assert all(0 <= r.offset_in_pack < 64 for r in rows)

    def test_spanning_doc_hits_consecutive_packs(self, spark):
        _, packed = self._packed(spark)
        by_doc = {}
        for r in packed.collect():
            by_doc.setdefault(r.doc_id, []).append(r.pack_id)
        spanning = {d: sorted(p) for d, p in by_doc.items() if len(p) > 1}
        assert spanning, "fixture must produce at least one spanning doc"
        for d, p in spanning.items():
            assert p == list(range(p[0], p[0] + len(p))), (d, p)

    def test_single_shuffle_on_shard_key(self, spark):
        from ctcityscraper_spark.operators.corpus import pack_sequences

        df, _ = self._packed(spark)
        plan = pack_sequences(df, seq_len=64, num_shards=4)._jdf.queryExecution().executedPlan().toString()
        # the window's shard-key exchange is the only shuffle
        assert plan.count("Exchange hashpartitioning") == 1, plan
        assert "Exchange rangepartitioning" not in plan


class TestMixtureResample:
    """mixture_resample (operators/corpus.py): output mixture approaches the
    target weights, decisions are deterministic per id, unknown strata drop."""

    WEIGHTS = {"a": 0.6, "b": 0.4}

    def _df(self, spark):
        # 90 'a' docs vs 10 'b': a must be downsampled, b upsampled
        rows = [Row(doc_id=i, lang="a" if i < 90 else "b") for i in range(100)]
        return spark.createDataFrame(rows)

    def test_mixture_hits_targets(self, spark):
        from ctcityscraper_spark.operators.corpus import mixture_resample

        out = mixture_resample(self._df(spark), self.WEIGHTS).collect()
        by = {}
        for r in out:
            by[r.lang] = by.get(r.lang, 0) + 1
        total = sum(by.values())
        # rates: a = .6*100/90 = .667 (keep-prob), b = .4*100/10 = 4.0 (epochs)
        assert abs(by["a"] / total - 0.6) < 0.1
        assert abs(by["b"] / total - 0.4) < 0.1
        # every b doc repeats exactly 4x (rate 4.0 has no fractional part)
        b_copies = [r.n_copies for r in out if r.lang == "b"]
        assert set(b_copies) == {4}
        assert sorted(r.copy for r in out if r.doc_id == 95) == [1, 2, 3, 4]

    def test_deterministic_and_drops_unknown(self, spark):
        from ctcityscraper_spark.operators.corpus import mixture_resample

        df = self._df(spark).union(
            spark.createDataFrame([Row(doc_id=999, lang="zz")])
        )
        a = sorted(map(tuple, mixture_resample(df, self.WEIGHTS).collect()))
        b = sorted(map(tuple, mixture_resample(df, self.WEIGHTS).collect()))
        assert a == b
        assert not any(r[1] == "zz" for r in a)

    def test_rates_broadcast_no_extra_shuffle(self, spark):
        from ctcityscraper_spark.operators.corpus import mixture_resample

        plan = (
            mixture_resample(self._df(spark), self.WEIGHTS)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan


class TestSubstringSpans:
    def test_single_maximal_span(self, spark):
        # docs share exactly one 12-char substring "ABCDEFGHIJKL" embedded
        # at different offsets; width 8 must merge 5 aligned windows into
        # one maximal span of length 12 with the right start positions
        shared = "ABCDEFGHIJKL"
        docs = _docs(spark, ["xx" + shared + "yyyyyy", "qqqq" + shared + "zz"])
        out = duplicate_substring_spans(docs, width=8).collect()
        assert len(out) == 1
        r = out[0]
        assert (r.doc_a, r.doc_b) == (0, 1)
        assert (r.start_a, r.start_b) == (3, 5)
        assert r.span_len == len(shared)
        assert r.n_windows == len(shared) - 8 + 1

    def test_short_docs_and_no_overlap_empty(self, spark):
        docs = _docs(spark, ["tiny", "completely different content here"])
        assert duplicate_substring_spans(docs, width=8).count() == 0

    def test_doc_cap_drops_boilerplate_window(self, spark):
        # the same 8-char window in 4 docs; cap=3 must suppress all pairs
        docs = _docs(spark, ["HEADER00" + s for s in ["a", "b", "c", "d"]])
        assert duplicate_substring_spans(docs, width=8, doc_cap=3).count() == 0
        assert duplicate_substring_spans(docs, width=8, doc_cap=None).count() == 6

    def test_min_span_filter(self, spark):
        shared = "ABCDEFGHIJKL"  # span of 12
        docs = _docs(spark, [shared + "xx", "yy" + shared])
        assert duplicate_substring_spans(docs, width=8, min_span=13).count() == 0
        assert duplicate_substring_spans(docs, width=8, min_span=12).count() == 1

    def test_repeated_window_within_doc_both_alignments(self, spark):
        # doc 1 contains the shared window twice -> two spans, one per
        # alignment delta
        w = "WINDOW88"
        docs = _docs(spark, [w + "pad", "aa" + w + "bb" + w])
        out = duplicate_substring_spans(docs, width=8).collect()
        assert len(out) == 2
        assert sorted((r.start_a, r.start_b) for r in out) == [(1, 3), (1, 13)]

    def test_hash_path_matches_string_path(self, spark):
        # the xxhash64-bucketed scale path (8-byte join keys + span-level
        # fetch-and-verify) must produce byte-identical output to the
        # exact string-keyed path on every span shape above
        shared = "ABCDEFGHIJKL"
        w = "WINDOW88"
        docs = _docs(
            spark,
            [
                "xx" + shared + "yyyyyy",
                "qqqq" + shared + "zz",
                w + "pad",
                "aa" + w + "bb" + w,
                "tiny",
            ],
        )
        cols = ["doc_a", "doc_b", "start_a", "start_b", "span_len", "n_windows"]
        a = sorted(
            map(tuple, duplicate_substring_spans(
                docs, width=8, bucket_by_hash=False).select(*cols).collect())
        )
        b = sorted(
            map(tuple, duplicate_substring_spans(
                docs, width=8, bucket_by_hash=True).select(*cols).collect())
        )
        assert a == b and len(a) > 0

    def test_cut_spans_higher_id_loses_and_passthrough(self, spark):
        from ctcityscraper_spark.operators.corpus import cut_duplicate_spans

        shared = "ABCDEFGHIJKL"
        docs = _docs(spark, ["xx" + shared + "yy", "qq" + shared + "zz",
                             "unrelated text"])
        spans = duplicate_substring_spans(docs, width=8)
        out = {r.doc_id: r for r in cut_duplicate_spans(docs, spans).collect()}
        # lowest-id occurrence survives; higher-id doc loses the span
        assert out[0].clean_text == "xx" + shared + "yy"
        assert out[0].n_cut_spans == 0
        assert out[1].clean_text == "qqzz"
        assert (out[1].n_cut_spans, out[1].n_cut_chars) == (1, len(shared))
        # docs in no pair pass through untouched
        assert out[2].clean_text == "unrelated text"
        assert (out[2].n_cut_spans, out[2].n_cut_chars) == (0, 0)

    def test_cut_spans_overlapping_intervals_merge(self, spark):
        from ctcityscraper_spark.operators.corpus import cut_duplicate_spans

        # doc 2 overlaps doc 0 in ABCDEFGHIJ and doc 1 in EFGHIJKLMN;
        # the two cut intervals overlap and must merge into one
        docs = _docs(
            spark,
            ["ABCDEFGHIJqqqq", "ppppEFGHIJKLMN", "zzABCDEFGHIJKLMNzz"],
        )
        spans = duplicate_substring_spans(docs, width=8)
        out = {r.doc_id: r for r in cut_duplicate_spans(docs, spans).collect()}
        assert out[2].clean_text == "zzzz"
        assert (out[2].n_cut_spans, out[2].n_cut_chars) == (1, 14)
        assert out[0].n_cut_spans == 0 and out[1].n_cut_spans == 0

    def test_incremental_reingested_doc_id_verifies_per_side(self, spark):
        # a doc_id present in BOTH the new batch (updated text) and the
        # stored corpus (old text) must verify each side against its own
        # version — a unioned text frame would emit duplicate span rows
        from ctcityscraper_spark.operators.corpus import (
            incremental_substring_spans,
        )

        S = "SHARED-SPAN-BODY-XYZ"
        corpus = spark.createDataFrame(
            [(5, "old version entirely different"), (7, "corpus " + S)],
            "doc_id long, text string",
        )
        new = spark.createDataFrame(
            [(5, "new " + S)], "doc_id long, text string"
        )
        out = incremental_substring_spans(
            new, corpus, width=8, bucket_by_hash=True
        ).collect()
        assert len(out) == 1
        assert (out[0].new_doc, out[0].corpus_doc) == (5, 7)

    def test_incremental_without_corpus_raises_cleanly(self, spark):
        from ctcityscraper_spark.operators.corpus import (
            incremental_substring_spans,
        )

        new = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
        with pytest.raises(ValueError, match="corpus_docs or corpus_windows"):
            incremental_substring_spans(new)

    def test_hash_path_plan_joins_on_long_key(self, spark):
        # scale claim: in the hashed path the bucket self-join keys are the
        # 8-byte xxhash64 longs — the window *string* must not appear as a
        # join key (it only reappears in the final verify substr compare)
        import re

        docs = _docs(spark, ["abcdefghijkl" * 3, "xxabcdefghijklxx"])
        plan = (
            duplicate_substring_spans(docs, width=8, bucket_by_hash=True)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "xxhash64" in plan
        join_lines = [
            ln for ln in plan.splitlines()
            if "SortMergeJoin" in ln or "ShuffledHashJoin" in ln
            or "BroadcastHashJoin" in ln
        ]
        assert join_lines, "no equi-join in hashed span plan"
        keyed = [ln for ln in join_lines if re.search(r"win_h#\d+", ln)]
        assert keyed, "bucket join must key on win_h"
        for ln in keyed:
            assert not re.search(r"\bwin#\d+", ln), (
                "window string must not be a join key in the hashed path"
            )


class TestTokenBudget:
    def test_budget_edges_and_overshoot(self, spark):
        from ctcityscraper_spark.operators.corpus import token_budget_selection

        docs = _docs(spark, [
            "high quality document with plenty of reasonable words here",
            "another good document with many reasonable common words",
            "short",
        ])
        total = sum(
            r.n_tokens
            for r in token_budget_selection(docs, 10**9).collect()
        )
        # huge budget selects everything
        assert token_budget_selection(docs, 10**9).count() == 3
        # zero budget selects nothing
        assert token_budget_selection(docs, 0).count() == 0
        # a budget of 1 token still selects exactly one document (greedy
        # prefix overshoots by at most the final document)
        assert token_budget_selection(docs, 1).count() == 1
        # selection is monotone in the budget
        n_half = token_budget_selection(docs, total // 2).count()
        assert 1 <= n_half <= 3

    def test_null_text_never_selected_and_exact_fit_ties(self, spark):
        """Null texts must not crash the driver-side bin walk (r5 ADVICE:
        None q_bin used to TypeError in sorted()), and budgets that land
        EXACTLY on a cumulative bin boundary must match the naive
        ``bef < budget`` rule row-for-row — including zero-token docs."""
        from pyspark.sql import Window

        from ctcityscraper_spark.operators.corpus import (
            BPE_SPLIT_RE,
            token_budget_selection,
        )
        from ctcityscraper_spark.functions.hashing import hash64
        from ctcityscraper_spark.operators.text import quality_score_col

        docs = spark.createDataFrame(
            [
                Row(doc_id=0, text="good common words spoken here repeatedly"),
                Row(doc_id=1, text=None),
                Row(doc_id=2, text="another decent document with many words"),
                Row(doc_id=3, text=""),
                Row(doc_id=4, text="the quick brown fox jumps over the dog"),
            ]
        )
        # no TypeError, and the null-text doc is never selected
        sel = {r.doc_id for r in token_budget_selection(docs, 10**9).collect()}
        assert 1 not in sel and sel >= {0, 2, 4}

        # naive twin (same null-bin exclusion), materialized once
        t = docs.select(
            "doc_id",
            F.size(F.regexp_extract_all("text", F.lit(BPE_SPLIT_RE), 0))
            .cast("long").alias("n_tokens"),
            F.floor(quality_score_col("text") * 1000).cast("int").alias("q_bin"),
            hash64(F.col("doc_id"), "budget").alias("h"),
        ).filter(F.col("q_bin").isNotNull())
        rows = t.orderBy(F.col("q_bin").desc(), "h", "doc_id").collect()
        cums, c = [], 0
        for r in rows:
            cums.append(c)
            c += r.n_tokens
        # sweep every cumulative boundary (exact fits) plus off-by-ones
        budgets = {0, 1, c} | set(cums) | {b + 1 for b in cums}
        for budget in sorted(budgets):
            got = sorted(
                (r.doc_id, r.n_tokens, r.q_bin)
                for r in token_budget_selection(docs, budget).collect()
            )
            naive = sorted(
                (r.doc_id, r.n_tokens, r.q_bin)
                for r, bef in zip(rows, cums)
                if bef < budget
            )
            assert got == naive, f"budget={budget}"

    def test_matches_naive_global_sort(self, spark):
        from pyspark.sql import Window

        from ctcityscraper_spark.operators.corpus import (
            BPE_SPLIT_RE,
            token_budget_selection,
        )
        from ctcityscraper_spark.functions.hashing import hash64
        from ctcityscraper_spark.operators.text import quality_score_col
        from ctcityscraper_spark.plans.tables import load_table

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        budget = 20_000
        got = sorted(
            (r.doc_id, r.n_tokens, r.q_bin)
            for r in token_budget_selection(docs, budget).collect()
        )
        # naive twin: one global window
        t = docs.select(
            "doc_id",
            F.size(F.regexp_extract_all("text", F.lit(BPE_SPLIT_RE), 0))
            .cast("long").alias("n_tokens"),
            F.floor(quality_score_col("text") * 1000).cast("int").alias("q_bin"),
            hash64(F.col("doc_id"), "budget").alias("h"),
        )
        w = Window.orderBy(F.col("q_bin").desc(), "h", "doc_id").rowsBetween(
            Window.unboundedPreceding, -1
        )
        naive = sorted(
            (r.doc_id, r.n_tokens, r.q_bin)
            for r in t.withColumn(
                "bef", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
            ).filter(F.col("bef") < budget).collect()
        )
        assert got == naive and len(got) > 0


class TestTokenBudgetSubRefinement:
    def test_single_bin_corpus_exercises_sub_histogram(self, spark):
        """All docs share ONE quality bin, so the whole selection rides
        the second-level hash-prefix histogram (full sub-bins by filter +
        one windowed straddling sub-bin). With sub_bits=2 the 4 sub-bins
        (top 2 bits of the 60-BIT hash64 — shift 58, not 62; a 64-based
        shift would collapse everything into sub-bin 0 and this test
        would silently stop exercising the full-sub path) each hold many
        docs, forcing both the full-sub and straddling-sub paths; the
        result must still equal the naive global sort, and be identical
        across sub_bits settings. The spread assertion below pins the
        multi-sub-bin precondition so the path can't silently vanish
        again."""
        from pyspark.sql import Window

        from ctcityscraper_spark.operators.corpus import (
            BPE_SPLIT_RE,
            token_budget_selection,
        )
        from ctcityscraper_spark.functions.hashing import hash64
        from ctcityscraper_spark.operators.text import quality_score_col

        # identical text length/shape => identical quality => one q_bin
        docs = spark.createDataFrame(
            [(i, "tok " * 5) for i in range(80)], "doc_id long, text string"
        )
        budget = 200  # 80 docs x 5 tokens = 400: budget lands mid-bin
        got = {
            r.doc_id
            for r in token_budget_selection(docs, budget, sub_bits=2).collect()
        }
        coarse = {
            r.doc_id
            for r in token_budget_selection(docs, budget, sub_bits=10).collect()
        }
        assert got == coarse
        # naive reference: global sort by (q_bin desc, _h, doc_id)
        naive = (
            docs.select(
                "doc_id",
                F.size(F.regexp_extract_all("text", F.lit(BPE_SPLIT_RE), 0))
                .cast("long")
                .alias("n_tokens"),
                F.floor(quality_score_col("text") * 1000).cast("int").alias("q_bin"),
                hash64(F.col("doc_id"), "budget").alias("_h"),
            )
            .withColumn(
                "_before",
                F.coalesce(
                    F.sum("n_tokens").over(
                        Window.orderBy(
                            F.col("q_bin").desc(), "_h", "doc_id"
                        ).rowsBetween(Window.unboundedPreceding, -1)
                    ),
                    F.lit(0),
                ),
            )
            .filter(F.col("_before") < budget)
        )
        assert got == {r.doc_id for r in naive.collect()}
        assert len(got) == 40  # 200 budget / 5 tokens each
        # precondition pin: the 80 doc hashes really spread over >1 of the
        # 4 sub-bins at sub_bits=2 (shift 58 of the 60-bit hash), i.e. the
        # full-sub filter path genuinely fires rather than one sub-bin
        # swallowing the whole bin as under the old 64-bit-width shift
        sub_bins = {
            r.sb
            for r in docs.select(
                F.shiftright(hash64(F.col("doc_id"), "budget"), 58).alias("sb")
            ).collect()
        }
        assert len(sub_bins) > 1 and sub_bins <= {0, 1, 2, 3}

    def test_sub_bits_out_of_range_raises(self, spark):
        """sub_bits=0 would collapse the 60-bit hash to ONE sub-bin (the
        single global window the refinement exists to avoid) and >32
        leaves too little within-sub-bin entropy — the guard must refuse
        both ends."""
        from ctcityscraper_spark.operators.corpus import token_budget_selection

        docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
        for bad in (0, -1, 33):
            with pytest.raises(ValueError, match="sub_bits"):
                token_budget_selection(docs, 10, sub_bits=bad)


class TestGlobalQualityRank:
    """global_quality_rank must equal the naive global-sort ROW_NUMBER on
    every distribution — including the degenerate ones the histogram path
    could get wrong (all-equal quality = one bin, NULLs, heavy ties)."""

    def _naive(self, df, qcol):
        from pyspark.sql import Window

        w = Window.orderBy(F.col(qcol).desc_nulls_last(), "doc_id")
        return {
            r.doc_id: r.rank
            for r in df.withColumn("rank", F.row_number().over(w)).collect()
        }

    @pytest.mark.parametrize(
        "qualities",
        [
            [0.5] * 20,                                  # all equal -> one bin
            [0.0, 1.0] * 10,                             # extremes incl. exact 1.0
            [None, 0.3, None, 0.9, 0.3, 0.3, None],      # NULLs + ties
            [i / 37 % 1.0 for i in range(60)],           # many distinct bins
        ],
    )
    def test_matches_naive_global_sort(self, spark, qualities):
        from ctcityscraper_spark.operators.corpus import global_quality_rank

        df = spark.createDataFrame(
            [(i, q) for i, q in enumerate(qualities)], "doc_id long, q double"
        )
        got = {
            r.doc_id: r.rank
            for r in global_quality_rank(df, F.col("q"), n_bins=8).collect()
        }
        assert got == self._naive(df, "q")

    def test_decile_sizes_are_ntile_shaped(self, spark):
        from ctcityscraper_spark.operators.corpus import global_quality_rank

        df = spark.createDataFrame(
            [(i, float(i % 17) / 17) for i in range(103)], "doc_id long, q double"
        )
        out = global_quality_rank(df, F.col("q"), deciles=10)
        sizes = [r["count"] for r in out.groupBy("decile").count().orderBy("decile").collect()]
        assert sum(sizes) == 103 and max(sizes) - min(sizes) <= 1

    def test_out_of_range_quality_clamps_with_exact_order(self, spark):
        """Quality outside [0,1] lands in the first/last bin but keeps its
        EXACT global position (within-bin ordering uses the raw value):
        before the two-sided clamp, quality in (-1/n_bins, 0) floored to
        bin -1 and silently collided with the NULL sentinel."""
        from ctcityscraper_spark.operators.corpus import global_quality_rank

        qualities = [-0.0004, 1.7, 0.95, -0.5, 0.0005, None, 2.3]
        df = spark.createDataFrame(
            [(i, q) for i, q in enumerate(qualities)], "doc_id long, q double"
        )
        got = {
            r.doc_id: r.rank
            for r in global_quality_rank(df, F.col("q"), n_bins=1024).collect()
        }
        assert got == self._naive(df, "q")

    def test_nan_quality_routes_to_trailing_bin(self, spark):
        """NaN quality means "no usable score": it ranks in the trailing
        bin alongside NULL instead of crashing the driver-side bin sort
        (floor(NaN) casts to a NULL bin -> TypeError on -None before the
        fix) or floating to rank 1 (NaN > every double in Spark's sort)."""
        from ctcityscraper_spark.operators.corpus import global_quality_rank

        df = spark.createDataFrame(
            [(1, 0.9), (2, float("nan")), (3, 0.1), (4, None)],
            "doc_id long, q double",
        )
        got = {
            r.doc_id: r.rank
            for r in global_quality_rank(df, F.col("q"), n_bins=16).collect()
        }
        assert got[1] == 1 and got[3] == 2
        assert {got[2], got[4]} == {3, 4}

    def test_infinite_quality_clamps_instead_of_ansi_overflow(self, spark):
        """+/-Infinity must clamp into the extreme bins (keeping exact
        order via the raw value): the double is clamped BEFORE floor,
        because floor(inf).cast("int") throws CAST_OVERFLOW under
        Spark 4's ANSI mode."""
        from ctcityscraper_spark.operators.corpus import global_quality_rank

        df = spark.createDataFrame(
            [(1, float("inf")), (2, 0.5), (3, float("-inf")), (4, 1.7)],
            "doc_id long, q double",
        )
        got = {
            r.doc_id: r.rank
            for r in global_quality_rank(df, F.col("q"), n_bins=16).collect()
        }
        assert got == {1: 1, 4: 2, 2: 3, 3: 4}

    def test_empty_and_nonempty_schemas_agree_on_string_ids(self, spark):
        """The empty-input early return derives the id type from the
        input (it used to hard-code long), so callers with string doc
        ids get one stable schema either way."""
        from ctcityscraper_spark.operators.corpus import global_quality_rank

        full = spark.createDataFrame(
            [("a", 0.5), ("b", 0.9)], "doc_id string, q double"
        )
        r_full = global_quality_rank(full, F.col("q"), n_bins=8)
        r_empty = global_quality_rank(full.filter("q > 10"), F.col("q"), n_bins=8)
        assert [(f.name, f.dataType) for f in r_full.schema.fields] == [
            (f.name, f.dataType) for f in r_empty.schema.fields
        ]
        assert r_empty.count() == 0
        assert {r.doc_id: r.rank for r in r_full.collect()} == {"b": 1, "a": 2}


class TestSinglePassUpstream:
    """The histogram-offset operators trigger a driver-side collect AND
    return a plan over the same input: without the internal persist the
    caller's upstream pipeline would execute once per consumer (the exact
    issue graph.connected_components fixes with its eager checkpoint).
    An accumulator-instrumented upstream counts real evaluations."""

    def _instrumented(self, spark, rows, schema):
        acc = spark.sparkContext.accumulator(0)

        def counting(it):
            for pdf in it:
                acc.add(len(pdf))
                yield pdf

        df = (
            spark.createDataFrame(rows, schema)
            .repartition(4)
            .mapInPandas(counting, schema)
        )
        return df, acc

    def test_global_quality_rank_single_upstream_pass(self, spark):
        from ctcityscraper_spark.operators.corpus import global_quality_rank

        df, acc = self._instrumented(
            spark,
            [(i, (i % 13) / 13) for i in range(200)],
            "doc_id long, q double",
        )
        out = global_quality_rank(df, F.col("q"), n_bins=16, deciles=10)
        assert out.count() == 200
        assert acc.value == 200, f"upstream ran {acc.value / 200:.1f}x"

    def test_token_budget_single_upstream_pass(self, spark):
        from ctcityscraper_spark.operators.corpus import token_budget_selection

        df, acc = self._instrumented(
            spark,
            [(i, "word " * (i % 7 + 1)) for i in range(120)],
            "doc_id long, text string",
        )
        out = token_budget_selection(df, budget_tokens=150)
        out.collect()
        assert acc.value == 120, f"upstream ran {acc.value / 120:.1f}x"


class TestUnigramSurprisal:
    def test_hand_computed_fixture(self, spark):
        """Token counts a=3, b=1, c=1 -> T=5; s(a)=len(bin(5//3))=1,
        s(b)=s(c)=len(bin(5))=3. NULL/empty-text docs emit no row."""
        from ctcityscraper_spark.operators.text import unigram_surprisal

        docs = spark.createDataFrame(
            [(1, "a a b"), (2, "a c"), (3, None), (4, "   ")],
            "doc_id long, text string",
        )
        got = {
            r.doc_id: (r.n_tokens, r.sum_bits, r.mean_surprisal)
            for r in unigram_surprisal(docs).collect()
        }
        assert got == {
            1: (3, 2 * 1 + 3, (2 * 1 + 3) / 3),
            2: (2, 1 + 3, 2.0),
        }

    def test_boilerplate_scores_below_rare_text(self, spark):
        """The CCNet-direction sanity check: a document repeating the
        corpus-dominant token must score strictly below one made of
        singleton tokens."""
        from ctcityscraper_spark.operators.text import unigram_surprisal

        docs = spark.createDataFrame(
            [(i, "common " * 20) for i in range(10)]
            + [(99, "zeta omicron quixotic")],
            "doc_id long, text string",
        )
        got = {r.doc_id: r.mean_surprisal for r in unigram_surprisal(docs).collect()}
        assert got[99] > got[0]


class TestCountMinSketch:
    def test_one_sided_error_and_exact_when_wide(self, spark):
        """CMS contract: estimate >= true count for EVERY term (one-sided),
        and with width >> vocabulary (no collisions possible to force) a
        narrow corpus estimates exactly."""
        from ctcityscraper_spark.operators.text import (
            cms_estimate,
            count_min_sketch,
            tokens_col,
        )

        docs = spark.createDataFrame(
            [(i, f"w{i % 7} w{i % 3} common") for i in range(60)],
            "doc_id long, text string",
        )
        truth = (
            docs.select(F.explode(tokens_col("text")).alias("term"))
            .filter(F.col("term") != "")
            .groupBy("term")
            .agg(F.count("*").alias("true_count"))
        )
        for width in (8, 4096):
            sketch = count_min_sketch(docs, width=width, depth=3)
            est = {
                r.term: (r.true_count, r.estimate)
                for r in cms_estimate(
                    truth, sketch, width=width, depth=3
                ).collect()
            }
            assert len(est) == 8  # w0..w6 (w0..w2 also hit by i%3), 'common'
            for term, (true_n, e) in est.items():
                assert e >= true_n, f"{term}: CMS must never underestimate"
            if width == 4096:
                # 9 terms x depth 3 in 4096 columns: collisions would need
                # a hash64 birthday miracle — estimates are exact
                assert all(e == t for t, e in est.values())

    def test_absent_term_estimates_zero_and_sketch_bounded(self, spark):
        from ctcityscraper_spark.operators.text import (
            cms_estimate,
            count_min_sketch,
        )

        docs = spark.createDataFrame(
            [(1, "a b c"), (2, "a a d")], "doc_id long, text string"
        )
        w, d = 1024, 4
        sketch = count_min_sketch(docs, width=w, depth=d)
        assert sketch.count() <= w * d
        probe = spark.createDataFrame(
            [("never-seen-token",)], "term string"
        )
        est = cms_estimate(probe, sketch, width=w, depth=d).collect()
        assert est[0].estimate == 0

    def test_estimate_joins_broadcast_sketch(self, spark):
        """The sketch side is <= depth*width rows at ANY corpus size — the
        estimate join must broadcast it, never shuffle the probe stream."""
        from ctcityscraper_spark.operators.text import (
            cms_estimate,
            count_min_sketch,
        )

        docs = spark.createDataFrame(
            [(1, "x y z")], "doc_id long, text string"
        )
        sketch = count_min_sketch(docs)
        probe = spark.createDataFrame([("x",)], "term string")
        plan = (
            cms_estimate(probe, sketch)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan

    def test_duplicate_item_rows_each_keep_an_estimate(self, spark):
        """Row-preservation contract: probing with duplicate rows must
        return one estimate row PER input row (the depth-way join path —
        a groupBy over item columns would silently collapse them)."""
        from ctcityscraper_spark.operators.text import (
            cms_estimate,
            count_min_sketch,
        )

        docs = spark.createDataFrame(
            [(1, "a a a b")], "doc_id long, text string"
        )
        sketch = count_min_sketch(docs)
        probe = spark.createDataFrame(
            [("a",), ("a",), ("b",)], "term string"
        )
        rows = cms_estimate(probe, sketch).collect()
        assert sorted((r.term, r.estimate) for r in rows) == [
            ("a", 3), ("a", 3), ("b", 1)
        ]

    def test_reserved_column_clash_raises(self, spark):
        from ctcityscraper_spark.operators.text import (
            cms_estimate,
            count_min_sketch,
        )

        docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        sketch = count_min_sketch(docs)
        bad = spark.createDataFrame([("x", 1)], "term string, estimate int")
        import pytest as _pytest
        with _pytest.raises(ValueError, match="reserved"):
            cms_estimate(bad, sketch)


class TestCmsDepthEdges:
    def test_depth_one_sketch_estimates(self, spark):
        """depth=1 is a legitimate single-hash sketch: cms_estimate must
        return the single cell (F.least needs >= 2 args — r8 ADVICE), and
        the one-sided contract still holds."""
        from ctcityscraper_spark.operators.text import (
            cms_estimate,
            count_min_sketch,
        )

        docs = spark.createDataFrame(
            [(1, "a b a"), (2, "b c")], "doc_id long, text string"
        )
        sketch = count_min_sketch(docs, width=4096, depth=1)
        probe = spark.createDataFrame([("a",), ("b",), ("zzz",)], "term string")
        got = {
            r.term: r.estimate
            for r in cms_estimate(probe, sketch, width=4096, depth=1).collect()
        }
        assert got["a"] >= 2 and got["b"] >= 2 and got["zzz"] >= 0
        # width >> vocab: no collisions, exact
        assert got == {"a": 2, "b": 2, "zzz": 0}

    def test_depth_zero_refused(self, spark):
        from ctcityscraper_spark.operators.text import cms_estimate

        probe = spark.createDataFrame([("a",)], "term string")
        import pytest as _pytest

        with _pytest.raises(ValueError, match="depth"):
            cms_estimate(probe, probe, depth=0)


class TestKmvSketch:
    def test_exact_below_k_and_estimator_above(self, spark):
        """Below k distinct values the sketch IS the distinct set and the
        estimate is exact; above k the classic (k-1)/(kth/2^60) estimator
        lands within a loose band of the truth on a deterministic corpus."""
        from ctcityscraper_spark.operators.text import (
            kmv_estimate,
            kmv_sketch_terms,
        )

        small = spark.createDataFrame(
            [(f"t{i % 5}",) for i in range(40)], "term string"
        )
        r = kmv_estimate(kmv_sketch_terms(small, "term", k=16), 16).collect()[0]
        assert (r.n_kept, r.distinct_est) == (5, 5.0)

        big = spark.createDataFrame(
            [(f"term-{i}",) for i in range(5000)], "term string"
        )
        r = kmv_estimate(kmv_sketch_terms(big, "term", k=64), 64).collect()[0]
        assert r.n_kept == 64
        assert 0.5 * 5000 < r.distinct_est < 2.0 * 5000

    def test_sketch_bounded_and_duplicates_nulls_ignored(self, spark):
        from ctcityscraper_spark.operators.text import kmv_sketch_terms

        terms = spark.createDataFrame(
            [("a",), ("a",), (None,), ("b",), ("b",)], "term string"
        )
        sk = kmv_sketch_terms(terms, "term", k=10).collect()
        assert len(sk) == 2  # distinct non-null terms only
        assert len({r.h for r in sk}) == 2

    def test_empty_stream_estimates_zero(self, spark):
        from ctcityscraper_spark.operators.text import (
            kmv_estimate,
            kmv_sketch_terms,
        )

        empty = spark.createDataFrame([], "term string")
        r = kmv_estimate(kmv_sketch_terms(empty, "term", k=8), 8).collect()[0]
        assert (r.n_kept, r.kth_h, r.distinct_est) == (0, None, 0.0)

    def test_partition_insensitive(self, spark):
        """Min-k-of-distinct must not depend on how the stream is split
        across partitions (the local Arrow top-k + global merge must be
        bit-identical to a single-partition build)."""
        from ctcityscraper_spark.operators.text import kmv_sketch_terms

        rows = [(f"x{i % 300}",) for i in range(2000)]
        one = spark.createDataFrame(rows, "term string").coalesce(1)
        many = spark.createDataFrame(rows, "term string").repartition(16)
        a = sorted(r.h for r in kmv_sketch_terms(one, "term", k=32).collect())
        b = sorted(r.h for r in kmv_sketch_terms(many, "term", k=32).collect())
        assert a == b and len(a) == 32

    def test_k_must_be_positive(self, spark):
        import pytest as _pytest

        from ctcityscraper_spark.operators.text import (
            kmv_sketch_by,
            kmv_sketch_terms,
        )

        t = spark.createDataFrame([("a",)], "term string")
        with _pytest.raises(ValueError, match="k must be"):
            kmv_sketch_terms(t, "term", k=0)
        g = spark.createDataFrame([("g", "a")], "grp string, term string")
        with _pytest.raises(ValueError, match="k must be"):
            kmv_sketch_by(g, ["grp"], "term", k=0)


class TestKmvPerGroup:
    def test_matches_independent_per_group_builds(self, spark):
        """kmv_sketch_by must equal running kmv_sketch_terms separately on
        each group's stream (same k, same seed)."""
        from ctcityscraper_spark.operators.text import (
            kmv_sketch_by,
            kmv_sketch_terms,
        )

        rows = [(f"g{i % 3}", f"t{i % 40}-{i % 7}") for i in range(600)]
        df = spark.createDataFrame(rows, "grp string, term string")
        k = 8
        got = {}
        for r in kmv_sketch_by(df, ["grp"], "term", k=k).collect():
            got.setdefault(r.grp, []).append(r.h)
        for g in ("g0", "g1", "g2"):
            solo = spark.createDataFrame(
                [(t,) for gg, t in rows if gg == g], "term string"
            )
            want = sorted(
                r.h for r in kmv_sketch_terms(solo, "term", k=k).collect()
            )
            assert sorted(got[g]) == want, g

    def test_estimate_by_exact_small_groups(self, spark):
        from ctcityscraper_spark.operators.text import (
            kmv_estimate_by,
            kmv_sketch_by,
        )

        df = spark.createDataFrame(
            [("a", "x"), ("a", "y"), ("b", "z")], "grp string, term string"
        )
        got = {
            r.grp: (r.n_kept, r.distinct_est)
            for r in kmv_estimate_by(
                kmv_sketch_by(df, ["grp"], "term", k=16), ["grp"], 16
            ).collect()
        }
        assert got == {"a": (2, 2.0), "b": (1, 1.0)}

    def test_group_window_is_keyed_not_single_partition(self, spark):
        """The final per-group top-k window must partition by the group
        keys — a plan with an empty window partitioning would funnel every
        partial through one task."""
        from ctcityscraper_spark.operators.text import kmv_sketch_by

        df = spark.createDataFrame(
            [("g", "t")], "grp string, term string"
        )
        plan = (
            kmv_sketch_by(df, ["grp"], "term", k=4)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "partitionBy=[]" not in plan.replace(" ", "")


class TestKmvOverlap:
    def test_exact_when_both_below_k(self, spark):
        """Neither sketch full -> theta = 2^60, fraction 1.0: every output
        is the exact set-operation count."""
        from ctcityscraper_spark.operators.text import (
            kmv_overlap,
            kmv_sketch_terms,
        )

        a = spark.createDataFrame([("x",), ("y",), ("z",)], "term string")
        b = spark.createDataFrame([("y",), ("z",), ("w",)], "term string")
        r = kmv_overlap(
            kmv_sketch_terms(a, "term", k=16),
            kmv_sketch_terms(b, "term", k=16),
            16,
        ).collect()[0]
        assert (r.n_inter, r.n_union, r.theta) == (2, 4, 1 << 60)
        assert (r.inter_est, r.union_est, r.jaccard_est) == (2.0, 4.0, 0.5)

    def test_estimator_band_above_k(self, spark):
        """Full sketches: estimates land within a loose band of the true
        set sizes on a deterministic 50%-overlap corpus."""
        from ctcityscraper_spark.operators.text import (
            kmv_overlap,
            kmv_sketch_terms,
        )

        a = spark.createDataFrame(
            [(f"t{i}",) for i in range(2000)], "term string"
        )
        b = spark.createDataFrame(
            [(f"t{i}",) for i in range(1000, 3000)], "term string"
        )
        r = kmv_overlap(
            kmv_sketch_terms(a, "term", k=128),
            kmv_sketch_terms(b, "term", k=128),
            128,
        ).collect()[0]
        assert r.theta < (1 << 60)
        assert 0.4 * 1000 < r.inter_est < 2.5 * 1000
        assert 0.5 * 3000 < r.union_est < 2.0 * 3000
        assert 0.1 < r.jaccard_est < 0.7  # true 1000/3000

    def test_empty_and_disjoint(self, spark):
        from ctcityscraper_spark.operators.text import (
            kmv_overlap,
            kmv_sketch_terms,
        )

        empty = spark.createDataFrame([], "term string")
        a = spark.createDataFrame([("x",)], "term string")
        r = kmv_overlap(
            kmv_sketch_terms(empty, "term", k=8),
            kmv_sketch_terms(empty, "term", k=8),
            8,
        ).collect()[0]
        assert (r.n_inter, r.n_union, r.jaccard_est) == (0, 0, 0.0)
        b = spark.createDataFrame([("q",)], "term string")
        r = kmv_overlap(
            kmv_sketch_terms(a, "term", k=8),
            kmv_sketch_terms(b, "term", k=8),
            8,
        ).collect()[0]
        assert (r.n_inter, r.n_union, r.inter_est) == (0, 2, 0.0)


class TestKmvNullGroup:
    def test_null_group_key_keeps_its_sketch(self, spark):
        """A NULL group key is a real group: kmv_sketch_by must emit its
        sketch rows (pandas groupby would silently drop NaN keys without
        dropna=False), matching what the keyed window merge keeps."""
        from ctcityscraper_spark.operators.text import kmv_sketch_by

        df = spark.createDataFrame(
            [("g", "a"), (None, "b"), (None, "c")],
            "grp string, term string",
        )
        rows = kmv_sketch_by(df, ["grp"], "term", k=8).collect()
        by_grp = {}
        for r in rows:
            by_grp.setdefault(r.grp, []).append(r.h)
        assert len(by_grp.get(None, [])) == 2
        assert len(by_grp.get("g", [])) == 1


class TestPackContinuation:
    """pack_sequences(base_offsets=...) — the pack-continuation delta
    path: when batch ids sort after stored ids, stored-run packs plus a
    batch run continued from the stored per-shard cursors must equal the
    one-shot packing of the union, row for row."""

    def test_continuation_equals_full_rerun(self, spark):
        import random

        from pyspark.sql import Row

        from ctcityscraper_spark.operators.corpus import pack_sequences

        rng = random.Random(3)
        rows = [
            Row(
                doc_id=i,
                text=" ".join(
                    rng.choice("abcdefg") for _ in range(rng.randint(0, 40))
                ),
            )
            for i in range(1, 400)
        ]
        df = spark.createDataFrame(rows)
        stored = df.filter(F.col("doc_id") < 300)
        batch = df.filter(F.col("doc_id") >= 300)
        sp = pack_sequences(stored, seq_len=64, num_shards=4)
        cursor = sp.groupBy("shard_id").agg(
            F.sum("n_tokens").alias("base_off")
        )
        bp = pack_sequences(
            batch, seq_len=64, num_shards=4, base_offsets=cursor
        )
        got = sorted(map(tuple, sp.unionByName(bp).collect()))
        full = sorted(
            map(tuple, pack_sequences(df, seq_len=64, num_shards=4).collect())
        )
        assert got == full and got

    def test_duplicate_cursor_rows_collapse(self, spark):
        """Exact duplicate cursor rows (a double-appended cursor parquet)
        must not fan the broadcast join out and double every pack row."""
        from pyspark.sql import Row

        from ctcityscraper_spark.operators.corpus import pack_sequences

        df = spark.createDataFrame(
            [Row(doc_id=i, text="w " * 10) for i in range(1, 30)]
        )
        dup = spark.createDataFrame(
            [(0, 100), (0, 100), (1, 50)], "shard_id int, base_off long"
        )
        uniq = spark.createDataFrame(
            [(0, 100), (1, 50)], "shard_id int, base_off long"
        )
        rows = lambda cur: sorted(
            map(
                tuple,
                pack_sequences(
                    df, seq_len=8, num_shards=4, base_offsets=cur
                ).collect(),
            )
        )
        assert rows(dup) == rows(uniq)

    def test_conflicting_cursor_rows_fail_loudly(self, spark):
        """Two DIFFERENT base_offs for one shard = a corrupt cursor:
        raise_error instead of silently mis-packing under whichever row
        the join picked."""
        import pytest
        from pyspark.sql import Row

        from ctcityscraper_spark.operators.corpus import pack_sequences

        df = spark.createDataFrame(
            [Row(doc_id=i, text="w " * 10) for i in range(1, 30)]
        )
        bad = spark.createDataFrame(
            [(0, 100), (0, 200)], "shard_id int, base_off long"
        )
        with pytest.raises(Exception, match="conflicting base_off"):
            pack_sequences(
                df, seq_len=8, num_shards=4, base_offsets=bad
            ).count()

    def test_missing_shards_start_at_zero(self, spark):
        from pyspark.sql import Row

        from ctcityscraper_spark.operators.corpus import pack_sequences

        df = spark.createDataFrame(
            [Row(doc_id=i, text="w " * 10) for i in range(1, 30)]
        )
        empty_cursor = spark.createDataFrame(
            [], "shard_id int, base_off long"
        )
        with_empty = sorted(
            map(
                tuple,
                pack_sequences(
                    df, seq_len=8, num_shards=4, base_offsets=empty_cursor
                ).collect(),
            )
        )
        plain = sorted(
            map(tuple, pack_sequences(df, seq_len=8, num_shards=4).collect())
        )
        assert with_empty == plain


class TestApplyOnlyBoilerplate:
    def test_precomputed_hot_matches_default(self, spark):
        """remove_boilerplate(hot=boilerplate_segments(segments(df)))
        must equal the self-computing default — the frozen-list apply
        path changes WHERE the hot list comes from, not what it does."""
        from pyspark.sql import Row

        from ctcityscraper_spark.operators.corpus import (
            boilerplate_segments,
            remove_boilerplate,
            segments,
        )

        docs = spark.createDataFrame(
            [
                Row(doc_id=i, text="the same header text here " * 2 + f"unique tail {i}")
                for i in range(6)
            ]
        )
        hot = boilerplate_segments(segments(docs), min_docs=3)
        r_default = sorted(
            map(tuple, remove_boilerplate(docs, min_docs=3).collect())
        )
        r_applied = sorted(
            map(tuple, remove_boilerplate(docs, hot=hot).collect())
        )
        assert r_applied == r_default

    def test_frozen_list_skips_new_boilerplate(self, spark):
        """The policy trade, pinned: boilerplate that only exists in the
        batch is NOT dropped when an (older) hot list is applied."""
        from pyspark.sql import Row

        from ctcityscraper_spark.operators.corpus import remove_boilerplate

        docs = spark.createDataFrame(
            [
                Row(doc_id=i, text="fresh repeated boilerplate words here " * 2)
                for i in range(10)
            ]
        )
        frozen = spark.createDataFrame([], "segment string")
        out = remove_boilerplate(docs, hot=frozen).collect()
        assert all(r.n_dropped == 0 and r.clean_text for r in out)
