"""Round-11 growth tests.

1. dup_span_coverage_exact determinism under DUPLICATE intervals
   (VERDICT r10 #1, the judge-caught flake): when one span is duplicated
   against several partner docs, the same (doc_id, s, e) interval
   legitimately appears multiple times in the interval table. Before the
   r11 fix, the two gaps-and-islands window passes ordered those ties
   independently and could split the duplicates across islands,
   double-counting coverage (observed: dup_fraction 2.0 on a 75-token
   doc). The fix — DISTINCT intervals, making (s, e) a unique total
   order per doc partition — must yield coverage <= 1.0 always and
   run-to-run stable results.
"""

from __future__ import annotations

from thread_based_map_reduce_spark.operators.dedup import (
    _SPAN_MIN_TOKENS,
    decontam_exact_spans_impl,
    span_coverage_impl,
)
from test_round10_growth import _brute_force_spans


def _planted_multidup_docs() -> dict[int, str]:
    """The sf0.001 doc-120 shape that triggered the r10 flake: one
    document whose single duplicated span is shared VERBATIM with three
    partner docs at the same local offset, so the (doc_id, s, e)
    interval enters the union table three times."""
    span = " ".join(f"s{i}" for i in range(9))  # 9 tokens > threshold
    return {
        120: f"p1 p2 {span}",  # interval (120, 2, 11) appears x3
        201: f"a1 {span} a2 a3",
        202: f"b1 b2 b3 {span}",
        203: f"{span} c1 c2 c3 c4",
        # a doc fully made of the span: coverage must be exactly 1.0,
        # never 2.0/3.0 as the tie bug produced
        300: span,
        999: "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10",  # zero coverage
    }


def test_span_coverage_distinct_intervals_never_exceed_one(spark):
    docs_map = _planted_multidup_docs()
    docs = spark.createDataFrame(
        [(d, t) for d, t in docs_map.items()], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in span_coverage_impl(docs).collect()}
    for d, r in rows.items():
        assert r.covered_tokens <= r.n_tokens, (
            f"doc {d}: covered {r.covered_tokens} > n_tokens {r.n_tokens} "
            "— the interval-union tie bug is back"
        )
        assert r.dup_fraction is None or r.dup_fraction <= 1.0
    # the x3-shared span covers each carrier exactly once
    assert rows[120].covered_tokens == 9
    assert rows[300].covered_tokens == 9
    assert rows[300].dup_fraction == 1.0
    assert rows[999].covered_tokens == 0


def test_span_coverage_run_to_run_stable(spark):
    """20 repeated evaluations must produce the identical result set —
    the r10 flake was a lucky-draw nondeterminism, not a constant error,
    so stability across repeats is the regression signal."""
    docs_map = _planted_multidup_docs()
    docs = spark.createDataFrame(
        [(d, t) for d, t in docs_map.items()], "doc_id long, text string"
    )
    baseline = None
    for _ in range(20):
        got = sorted(
            (r.doc_id, r.n_tokens, r.covered_tokens, r.dup_fraction)
            for r in span_coverage_impl(docs).collect()
        )
        if baseline is None:
            baseline = got
        assert got == baseline


# -- decontam_exact_substring (VERDICT r10 #2) --------------------------------


def _planted_decontam_docs() -> dict[int, str]:
    """doc_id % 41 == 0 plays the eval split (curation.EVAL_MOD). Doc 0
    and doc 41 are eval; the others train. Plants: a full verbatim eval
    copy (coverage 1.0), a partial copy, a sub-threshold copy (must be
    invisible), train-train duplication (must NOT count as
    contamination), and a clean doc."""
    ev = " ".join(f"e{i}" for i in range(12))  # eval passage, 12 tokens
    ev7 = " ".join(f"e{i}" for i in range(7))  # exactly-threshold prefix
    ev6 = " ".join(f"e{i}" for i in range(6))  # below threshold
    tt = " ".join(f"d{i}" for i in range(9))  # train-train duplicated span
    return {
        0: f"{ev} x1 x2 x3",  # eval
        41: f"y1 {ev7} y2 y3 y4 y5 y6",  # eval (redundant prefix source)
        1: ev,  # train: fully contaminated
        2: f"a1 a2 {ev} a3",  # train: partial copy
        3: f"b1 b2 b3 {ev6} b4 b5 b6 b7",  # train: sub-threshold only
        4: f"c1 {tt} c2 c3 c4 c5",  # train-train dup, no eval overlap
        5: f"c6 c7 {tt} c8 c9",  # train-train dup, no eval overlap
        6: "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10",  # clean
    }


def test_decontam_exact_substring_matches_bruteforce(spark):
    docs_map = _planted_decontam_docs()
    docs = spark.createDataFrame(
        [(d, t) for d, t in docs_map.items()], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_tokens, r.contaminated_tokens, r.contaminated)
        for r in decontam_exact_spans_impl(docs, 41).collect()
    }
    # brute-force truth: spans between every (train, eval) pair only
    spans = _brute_force_spans(docs_map, _SPAN_MIN_TOKENS)
    ivals: dict[int, list[tuple[int, int]]] = {}
    for a, b, sa, sb, ln in spans:
        for d, s in ((a, sa), (b, sb)):
            other = b if d == a else a
            if d % 41 != 0 and other % 41 == 0:  # train side of a cross pair
                ivals.setdefault(d, []).append((s, s + ln))
    want = {}
    for d, text in docs_map.items():
        if d % 41 == 0:
            continue  # eval docs are not in the output
        merged = []
        for s, e in sorted(set(ivals.get(d, []))):
            if merged and s <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e))
            else:
                merged.append((s, e))
        cov = sum(e - s for s, e in merged)
        want[d] = (len(text.split()), cov, cov > 0)
    assert got == want
    # the fixture exercises the interesting cases
    assert got[1] == (12, 12, True)  # full verbatim eval copy
    assert got[2][2] and got[2][1] == 12  # partial copy found
    assert not got[3][2]  # sub-threshold copy invisible
    assert not got[4][2] and not got[5][2]  # train-train dup is NOT contam
    assert not got[6][2]  # clean doc


# -- gopher_repetition_rules (VERDICT r10 #3) ---------------------------------


def _gopher_ref(text: str) -> dict:
    """Independent Python reference for the Gopher statistics, with the
    same pinned conventions (whitespace-normalized chars; beyond-first
    duplicate char mass; longest-gram tie break; interval-union overlap
    handling)."""
    toks = [t for t in text.split(" ") if t]
    joined = " ".join(toks)
    total = len(joined)
    out = {}
    for name, sep in (("dup_line", "\n"), ("dup_para", "\n\n")):
        units = [u for u in text.split(sep) if u]
        from collections import Counter

        c = Counter(units)
        n = len(units)
        out[f"{name}_frac"] = (n - len(c)) / n if n else 0.0
        tot = sum(len(u) for u in units)
        dup = sum((k - 1) * len(u) for u, k in c.items() if k > 1)
        out[f"{name}_char_frac"] = dup / tot if tot else 0.0
    from collections import Counter

    for n in (2, 3, 4):
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
        if not grams or not total:
            out[f"top{n}gram_char_frac"] = 0.0
            continue
        c = Counter(grams)
        mc = max(c.values())
        toplen = max(len(g) for g, k in c.items() if k == mc)
        out[f"top{n}gram_char_frac"] = mc * toplen / total
    # token char offsets in the joined string
    offs, o = [], 0
    for t in toks:
        offs.append((o, o + len(t)))
        o += len(t) + 1
    for n in (5, 6, 7, 8, 9, 10):
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
        c = Counter(grams)
        ivals = sorted(
            (offs[i][0], offs[i + n - 1][1])
            for i, g in enumerate(grams)
            if c[g] >= 2
        )
        cov, last = 0, -1
        for s, e in ivals:
            s = max(s, last)
            if e > s:
                cov += e - s
            last = max(last, e)
        out[f"dup{n}gram_char_frac"] = cov / total if total else 0.0
    return out


def test_gopher_rules_match_reference(spark):
    from thread_based_map_reduce_spark.operators.text import (
        gopher_repetition_impl,
    )

    span5 = " ".join(f"r{i}" for i in range(5))
    docs_map = {
        1: "l1\nl2\nl1\nl3",  # duplicate lines
        2: "pA xx\n\npB yy\n\npA xx",  # duplicate paragraphs (and lines)
        3: "a b a b a b a b",  # dominant 2-gram
        4: f"{span5} {span5} {span5}",  # overlapping dup 5..10-grams
        5: " ".join(f"u{i}" for i in range(30)),  # clean
        6: "one",  # single token: no grams at all
    }
    docs = spark.createDataFrame(
        [(d, t) for d, t in docs_map.items()], "doc_id long, text string"
    )
    rows = {r.doc_id: r.asDict() for r in gopher_repetition_impl(docs).collect()}
    for d, text in docs_map.items():
        want = _gopher_ref(text)
        got = rows[d]
        for k, v in want.items():
            assert abs(got[k] - round(v, 6)) < 1e-9, (d, k, got[k], v)
    # the interval union counts overlapping duplicated grams ONCE:
    # doc 4 is wall-to-wall duplicated 5-grams -> exactly 1.0, never ~3x
    assert rows[4]["dup5gram_char_frac"] == 1.0
    assert rows[4]["dup10gram_char_frac"] == 1.0
    assert not rows[4]["passes_gopher_repetition"]
    assert rows[5]["passes_gopher_repetition"]
    assert rows[1]["dup_line_frac"] == 0.25
    assert rows[2]["dup_para_frac"] == round(1 / 3, 6) or abs(
        rows[2]["dup_para_frac"] - 0.333333
    ) < 1e-9
    assert not rows[1]["passes_gopher_repetition"]  # 0.25 > 0.20 char frac


# -- c4_filters + gopher_quality_rules (round-11 growth) ----------------------


def test_c4_filters_planted(spark):
    from thread_based_map_reduce_spark.plans.catalog import CATALOG, _load_all

    _load_all()
    fn = CATALOG["c4_filters"].fn
    import tempfile, os

    docs_map = {
        # 3 kept lines (terminal punct + >=5 words), 3 sentences -> passes
        1: "this line has five good words.\n"
        "another line with enough words here!\n"
        "a third full line ends properly?",
        # kept lines but only 2 sentences -> fails the sentence gate
        2: "this line has five good words.\nanother line with enough words!",
        # short lines (4 words) are dropped -> 0 sentences
        3: "only four words here.\nagain four words only!",
        # no terminal punctuation -> no kept lines
        4: "plenty of words but no punctuation at all on this line",
        # page gates
        5: "this line has five good words. and lorem ipsum lurks here.",
        6: "this line has five good words. but it contains a { brace.",
        7: "this line has five good words. sadly badword2 appears here.",
        # quoted-speech terminal
        8: 'he said five words exactly "fine."\n'
        "second line with enough words.\nthird line with enough words.",
    }
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            [(d, t, "en") for d, t in docs_map.items()],
            "doc_id long, text string, lang string",
        ).write.parquet(os.path.join(td, "documents.parquet"))
        rows = {r.doc_id: r for r in fn(spark, td).collect()}
    assert rows[1].passes_c4 and rows[1].n_kept_lines == 3
    assert rows[1].n_sentences == 3
    assert not rows[2].passes_c4 and rows[2].n_sentences == 2
    assert rows[3].n_kept_lines == 0 and not rows[3].passes_c4
    assert rows[4].n_kept_lines == 0
    assert rows[5].has_lorem_ipsum and not rows[5].passes_c4
    assert rows[6].has_brace and not rows[6].passes_c4
    assert rows[7].has_bad_word and not rows[7].passes_c4
    assert rows[8].n_kept_lines == 3 and rows[8].passes_c4


def test_gopher_quality_rules_planted(spark):
    from thread_based_map_reduce_spark.plans.catalog import CATALOG, _load_all

    _load_all()
    fn = CATALOG["gopher_quality_rules"].fn
    import tempfile, os

    good = " ".join(
        ["the", "be", "to", "of"] + [f"word{i:02d}" for i in range(60)]
    )  # 64 words, mean len ~6, 4 stop words, all alphabetic
    docs_map = {
        1: good,
        2: "too few words " + " ".join(["the", "of"]),  # < 50 words
        3: good + " " + " ".join(["####"] * 20),  # symbol ratio blows up
        4: "\n".join(["• bullet"] * 10),  # 100% bullet lines (and short)
        5: good.replace("the", "zzz").replace("be", "yyy")
        .replace("to", "xxx").replace("of", "www"),  # no stop words
        6: " ".join(["123"] * 60),  # no alphabetic words
    }
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            [(d, t, "en") for d, t in docs_map.items()],
            "doc_id long, text string, lang string",
        ).write.parquet(os.path.join(td, "documents.parquet"))
        rows = {r.doc_id: r for r in fn(spark, td).collect()}
    assert rows[1].passes_gopher_quality
    assert rows[1].stop_word_hits == 4
    assert not rows[2].passes_gopher_quality  # word-count gate
    assert rows[3].symbol_word_ratio > 0.1
    assert not rows[3].passes_gopher_quality
    assert rows[4].bullet_line_frac == 1.0
    assert not rows[4].passes_gopher_quality
    assert rows[5].stop_word_hits == 0
    assert not rows[5].passes_gopher_quality
    assert rows[6].alpha_word_frac == 0.0
    assert not rows[6].passes_gopher_quality


def test_curation_funnel_monotone_and_planted(spark):
    """The funnel must be monotone non-increasing in both docs and
    tokens, and a planted corpus must show a NON-degenerate funnel:
    every stage drops something yet survivors remain."""
    from thread_based_map_reduce_spark.plans.catalog import CATALOG, _load_all

    _load_all()
    fn = CATALOG["curation_funnel_stats"].fn
    import tempfile, os

    good = " ".join(
        ["the", "be", "to", "of"] + [f"word{i:02d}" for i in range(60)]
    )
    rep = " ".join(["loop the be to of words again"] * 12)  # repetitious
    docs_map = {
        1: good,  # survives everything
        2: good,  # exact duplicate of 1 -> dropped at exact_dedup
        3: rep,  # passes dedup, fails repetition (dup n-grams)
        # 60 distinct words, passes repetition, but NO Gopher stop words
        # -> fails only at the quality stage
        4: " ".join(f"nostop{i:02d}" for i in range(60)),
        5: good + " extra tail of words",  # survives everything
    }
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            [(d, t, "en") for d, t in docs_map.items()],
            "doc_id long, text string, lang string",
        ).write.parquet(os.path.join(td, "documents.parquet"))
        rows = {r.stage: r for r in fn(spark, td).collect()}
    assert [rows[i].stage_name for i in range(4)] == [
        "raw", "exact_dedup", "gopher_repetition", "gopher_quality",
    ]
    docs = [rows[i].docs_surviving for i in range(4)]
    toks = [rows[i].tokens_surviving for i in range(4)]
    assert docs == sorted(docs, reverse=True)
    assert toks == sorted(toks, reverse=True)
    assert docs[0] == 5
    assert docs[1] == 4  # doc 2 dropped as an exact duplicate
    assert docs[2] == 3  # doc 3 dropped by repetition rules
    assert docs[3] == 2  # doc 4 dropped by quality rules
    assert toks[3] > 0


def test_filter_ablation_invariants(spark):
    """Marginal counts are bounded by independent counts, and a doc that
    uniquely fails one filter shows up in exactly that filter's marginal
    set."""
    from thread_based_map_reduce_spark.plans.catalog import CATALOG, _load_all

    _load_all()
    fn = CATALOG["curation_filter_ablation"].fn
    import tempfile, os

    good = " ".join(
        ["the", "be", "to", "of"] + [f"word{i:02d}" for i in range(60)]
    )
    rep = " ".join(["loop the be to of words again"] * 12)
    docs_map = {
        1: good,
        2: good,  # exact dup of 1 -> fails exact_dedup AND span coverage
        3: rep + " " + good,  # repetitious but passes quality: check marginals
        5: good + " extra tail of words",
        # 60 distinct words, no stop words -> uniquely fails quality
        6: " ".join(f"nostop{i:02d}" for i in range(60)),
    }
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            [(d, t, "en") for d, t in docs_map.items()],
            "doc_id long, text string, lang string",
        ).write.parquet(os.path.join(td, "documents.parquet"))
        rows = {r.filter_name: r for r in fn(spark, td).collect()}
    assert set(rows) == {
        "exact_dedup", "gopher_repetition", "gopher_quality",
        "span_coverage", "decontam_overlap",
    }
    for r in rows.values():
        assert r.marginal_docs <= r.docs_failing
        assert r.marginal_tokens <= r.tokens_failing
    # doc 2 fails exact_dedup, but its MARGINAL contribution is zero: an
    # exact duplicate is always also fully span-covered (dup_fraction
    # 1.0) — exactly the redundancy insight the ablation exists to show
    assert rows["exact_dedup"].docs_failing == 1
    assert rows["exact_dedup"].marginal_docs == 0
    assert rows["span_coverage"].docs_failing >= 2  # docs 1 and 2 at least
    # doc 6 uniquely fails quality (no stop words, passes everything else)
    assert rows["gopher_quality"].docs_failing == 1
    assert rows["gopher_quality"].marginal_docs == 1


def test_decontam_scrub_text_planted(spark):
    """The scrub must cut exactly the contaminated token ranges and
    rejoin the rest in order — including the overlap case (two spans
    covering one token remove it once) and the fully-contaminated doc."""
    from thread_based_map_reduce_spark.operators.dedup import (
        decontam_train_ivals,
        _interval_union_coverage,  # noqa: F401
    )
    from thread_based_map_reduce_spark.plans.catalog import CATALOG, _load_all

    _load_all()
    docs_map = _planted_decontam_docs()
    docs = spark.createDataFrame(
        [(d, t) for d, t in docs_map.items()], "doc_id long, text string"
    )
    train, ivals = decontam_train_ivals(docs, 41)
    iv = {}
    for r in ivals.collect():
        iv.setdefault(r.doc_id, []).append((r.s, r.e))
    # python reference scrub
    want = {}
    for d, text in docs_map.items():
        if d % 41 == 0:
            continue
        toks = text.split()
        covered = set()
        for s, e in iv.get(d, []):
            covered.update(range(s, e))
        keep = [t for i, t in enumerate(toks) if i not in covered]
        want[d] = (len(toks), len(covered), " ".join(keep))
    # drive the registered query through a parquet round-trip fixture
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            [(d, t, "en") for d, t in docs_map.items()],
            "doc_id long, text string, lang string",
        ).write.parquet(os.path.join(td, "documents.parquet"))
        got = {
            r.doc_id: (r.n_tokens, r.removed_tokens, r.clean_text)
            for r in CATALOG["decontam_scrub_text"].fn(spark, td).collect()
        }
    assert got == want
    assert got[1] == (12, 12, "")  # fully contaminated -> empty
    assert got[2][1] == 12 and got[2][2] == "a1 a2 a3"  # interior cut
    assert got[6][1] == 0 and got[6][2] == docs_map[6]  # clean untouched


# -- plan gates for the r11 entries --------------------------------------------


def test_map_only_filters_have_zero_exchange(spark, sf_dir):
    """gopher_quality_rules and c4_filters claim 'map-only at any scale'
    — freeze it: their plans must carry no Exchange, no join, no window."""
    from test_plans import count_nodes, plan_of

    for name in ("gopher_quality_rules", "c4_filters"):
        plan = plan_of(spark, sf_dir, name)
        for node in ("Exchange", "Join", "Window", "CartesianProduct"):
            assert count_nodes(plan, node) == 0, (name, node, plan)


def test_decontam_broadcasts_only_the_eval_side(spark, sf_dir):
    """decontam_exact_substring's corpus side must never be a broadcast
    build: no CartesianProduct / BroadcastNestedLoopJoin, and the span
    extension joins on the train token table stay shuffle-pinned."""
    from test_plans import count_nodes, plan_of

    plan = plan_of(spark, sf_dir, "decontam_exact_substring")
    assert count_nodes(plan, "CartesianProduct") == 0
    assert count_nodes(plan, "BroadcastNestedLoopJoin") == 0
    # the train-side token join is pinned SHUFFLE_HASH -> at least one
    # ShuffledHashJoin must survive planning (it would vanish if the
    # corpus-sized checkpoint scan ever became the broadcast candidate)
    assert count_nodes(plan, "ShuffledHashJoin") >= 1, plan


def test_dedup_scrub_spans_keep_first(spark):
    """Keep-first semantics: the earliest occurrence of a duplicated
    span survives; later docs have it cut; a doc whose span matches TWO
    earlier docs is cut exactly once."""
    from thread_based_map_reduce_spark.plans.catalog import CATALOG, _load_all

    _load_all()
    span = " ".join(f"s{i}" for i in range(9))
    docs_map = {
        1: f"a1 a2 {span} a3",  # earliest occurrence: kept intact
        2: f"b1 {span} b2",  # later: span cut
        3: span,  # later + matches docs 1 AND 2: cut once -> empty
        4: "u1 u2 u3 u4 u5 u6 u7 u8",  # unrelated: untouched
    }
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            [(d, t, "en") for d, t in docs_map.items()],
            "doc_id long, text string, lang string",
        ).write.parquet(os.path.join(td, "documents.parquet"))
        got = {
            r.doc_id: (r.n_tokens, r.removed_tokens, r.clean_text)
            for r in CATALOG["dedup_scrub_spans"].fn(spark, td).collect()
        }
    assert got[1] == (12, 0, docs_map[1])  # first occurrence untouched
    assert got[2] == (11, 9, "b1 b2")
    assert got[3] == (9, 9, "")
    assert got[4] == (8, 0, docs_map[4])
