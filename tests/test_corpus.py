"""Training-corpus prep operators (chunking, packing, decontamination,
BM25) vs pure-Python replays."""

import hashlib
import math

import pytest

from unarxive_spark.operators.corpus import (
    bm25_scores,
    chunk_documents,
    decontaminate,
    pack_sequences,
)


def _h64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


DOCS = [
    (1, "a b c d e f g h i j"),          # 10 tokens
    (2, "x y z"),                         # 3 tokens
    (3, " ".join(f"t{i}" for i in range(25))),  # 25 tokens
    (4, "solo"),                          # 1 token
]
SCHEMA = "doc_id long, text string"


def test_chunk_documents_boundaries(spark):
    """chunk_tokens=8, overlap=2 → step 6; replay the window math."""
    df = spark.createDataFrame(DOCS, SCHEMA)
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["n_tokens"], r["chunk_text"])
        for r in chunk_documents(
            df, chunk_tokens=8, overlap=2
        ).collect()
    }
    want = {}
    for did, text in DOCS:
        toks = text.split()
        n = len(toks)
        step = 6
        n_chunks = 1 + max(0, math.ceil((n - 8) / step))
        for i in range(n_chunks):
            sl = toks[i * step : i * step + 8]
            want[(did, i)] = (len(sl), " ".join(sl))
    assert got == want
    # every token position is covered by some chunk
    for did, text in DOCS:
        n = len(text.split())
        covered = set()
        for (d, i), (nt, _) in want.items():
            if d == did:
                covered |= set(range(i * 6, i * 6 + nt))
        assert covered == set(range(n))


def test_chunk_documents_rejects_bad_overlap(spark):
    df = spark.createDataFrame(DOCS, SCHEMA)
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, chunk_tokens=8, overlap=8)


def test_pack_sequences_layout(spark):
    """Placement == replay of the (shard, h64, id) stream order;
    offsets are gapless and sequence spans are consistent."""
    df = spark.createDataFrame(DOCS, SCHEMA)
    rows = pack_sequences(df, capacity=8, n_shards=4).collect()
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["start_offset"],
            r["first_seq"],
            r["last_seq"],
        )
        for r in rows
    }
    order = sorted(
        DOCS,
        key=lambda t: (_h64(str(t[0])) % 4, _h64(str(t[0])), t[0]),
    )
    off = 0
    want = {}
    for did, text in order:
        n = len(text.split())
        first = off // 8
        last = (off + max(n - 1, 0)) // 8
        want[did] = (n, off, first, last)
        off += n
    assert got == want
    # gapless: offsets sorted == prefix sums of lengths
    offs = sorted(v[1] for v in got.values())
    lens = [v[0] for v in sorted(got.values(), key=lambda v: v[1])]
    acc = 0
    for o, ln in zip(offs, lens):
        assert o == acc
        acc += ln


def test_decontaminate_scrubs_shared_ngrams(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over dogs"),
            (2, "completely different words entirely here now"),
            (3, "QUICK BROWN FOX jumps elsewhere today"),  # case-insens
        ],
        SCHEMA,
    )
    bench = spark.createDataFrame(
        [(100, "something quick brown fox jumps something")], SCHEMA
    )
    kept = sorted(
        r["doc_id"]
        for r in decontaminate(train, bench, n=4).collect()
    )
    # doc 1 shares "quick brown fox jumps"; doc 3 shares it modulo case
    assert kept == [2]
    # with n too large to match, nothing is scrubbed
    kept_all = sorted(
        r["doc_id"]
        for r in decontaminate(train, bench, n=7).collect()
    )
    assert kept_all == [1, 2, 3]


def test_bm25_matches_python_replay(spark):
    df = spark.createDataFrame(DOCS, SCHEMA)
    terms = ["a", "x", "t3"]
    got = {
        r["doc_id"]: (r["n_hits"], r["bm25"])
        for r in bm25_scores(df, terms, k1=1.2, b=0.75).collect()
    }
    docs = {d: t.lower().split() for d, t in DOCS}
    n_docs = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n_docs
    dfreq = {
        t: sum(1 for toks in docs.values() if t in toks) for t in terms
    }
    want = {}
    for did, toks in docs.items():
        hits = [t for t in terms if t in toks]
        if not hits:
            continue
        s = 0.0
        for t in hits:
            tf = toks.count(t)
            idf = math.log(
                1 + (n_docs - dfreq[t] + 0.5) / (dfreq[t] + 0.5)
            )
            s += (
                idf
                * tf
                * 2.2
                / (tf + 1.2 * (0.25 + 0.75 * len(toks) / avgdl))
            )
        want[did] = (len(hits), round(s, 6))
    assert got == want
    with pytest.raises(ValueError, match="non-empty"):
        bm25_scores(df, [])


def test_bigram_pmi_matches_python_replay(spark):
    from unarxive_spark.operators.corpus import bigram_pmi

    rows = [
        (1, "new york new york city"),
        (2, "new york is a city"),
        (3, "a brand new day in york"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {
        (r["token_a"], r["token_b"]): (
            r["c_ab"],
            r["c_a"],
            r["c_b"],
            r["pmi"],
        )
        for r in bigram_pmi(df, min_count=2).collect()
    }
    toks = [t.split() for _, t in rows]
    unis = [t for ts in toks for t in ts]
    bis = [
        (ts[i], ts[i + 1]) for ts in toks for i in range(len(ts) - 1)
    ]
    n_uni, n_bi = len(unis), len(bis)
    want = {}
    for a, b in set(bis):
        c_ab = bis.count((a, b))
        if c_ab < 2:
            continue
        c_a, c_b = unis.count(a), unis.count(b)
        pmi = math.log(
            (float(c_ab) * n_uni * n_uni) / (float(n_bi) * c_a * c_b)
        )
        want[(a, b)] = (c_ab, c_a, c_b, round(pmi, 6))
    assert got == want
    assert ("new", "york") in got  # the collocation is found
    # "new york" should score far above chance
    assert got[("new", "york")][3] > 0.5


def test_kneser_ney_matches_python_replay(spark):
    from unarxive_spark.operators.corpus import kneser_ney_bigram

    rows = [
        (1, "new york new york city"),
        (2, "new york is a city"),
        (3, "a brand new day in york"),
        (4, "new york new day"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {
        (r["w1"], r["w2"]): (
            r["c12"],
            r["c1"],
            r["n_follow"],
            r["n_prec"],
            r["pkn"],
        )
        for r in kneser_ney_bigram(df, min_count=2).collect()
    }
    toks = [t.split() for _, t in rows]
    bis = [(ts[i], ts[i + 1]) for ts in toks for i in range(len(ts) - 1)]
    types = set(bis)
    D, n_types = 0.75, len(types)
    want = {}
    for w1, w2 in types:
        c12 = bis.count((w1, w2))
        if c12 < 2:
            continue
        c1 = sum(1 for a, _ in bis if a == w1)
        n_follow = len({b for a, b in types if a == w1})
        n_prec = len({a for a, b in types if b == w2})
        pkn = max(float(c12) - D, 0.0) / c1 + (D * n_follow / c1) * (
            float(n_prec) / n_types
        )
        want[(w1, w2)] = (c12, c1, n_follow, n_prec, round(pkn, 6))
    assert got == want
    # per-context probabilities (with the interpolated mass over the
    # full vocabulary) stay inside (0, 1]
    assert all(0.0 < v[4] <= 1.0 for v in got.values())
    assert ("new", "york") in got


def test_kneser_ney_full_context_sums_to_one(spark):
    """For a context w1, summing P_KN over ALL observed continuations
    plus the backoff mass of unseen ones must equal 1 — the defining
    property of a proper smoothed distribution. With min_count=1 every
    observed bigram row is present, so sum over rows of
    (c12-D)/c1 + backoff terms = 1 - D*n_follow/c1*(uncovered mass)."""
    from unarxive_spark.operators.corpus import kneser_ney_bigram

    rows = [(1, "a b a c a b a d b c")]
    df = spark.createDataFrame(rows, SCHEMA)
    out = kneser_ney_bigram(df, min_count=1).collect()
    by_ctx = {}
    for r in out:
        by_ctx.setdefault(r["w1"], []).append(r)
    toks = rows[0][1].split()
    bis = [(toks[i], toks[i + 1]) for i in range(len(toks) - 1)]
    types = set(bis)
    n_types = len(types)
    for w1, rws in by_ctx.items():
        c1 = rws[0]["c1"]
        n_follow = rws[0]["n_follow"]
        seen_prec = sum(r["n_prec"] for r in rws)
        # observed-row mass + the continuation mass of UNSEEN w2
        unseen_prec = sum(
            len({a for a, b in types if b == w2})
            for w2 in {b for _, b in types}
            if (w1, w2) not in types
        )
        total = sum(r["pkn"] for r in rws) + (
            0.75 * n_follow / c1
        ) * (unseen_prec / n_types)
        assert abs(total - 1.0) < 1e-4, (w1, total)


def test_corpus_plan_shapes(spark):
    """100-TB plan contracts: chunking adds no shuffle; decontaminate's
    benchmark side broadcasts; nothing in the family falls back to a
    cartesian."""
    df = spark.createDataFrame(DOCS, SCHEMA)

    chunk_plan = (
        chunk_documents(df, chunk_tokens=8, overlap=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in chunk_plan

    bench = spark.createDataFrame(DOCS[:1], SCHEMA)
    decon_plan = (
        decontaminate(df, bench, n=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in decon_plan
    for op in ("CartesianProduct",):
        for plan in (chunk_plan, decon_plan):
            assert op not in plan


def test_tfidf_doc_pairs_matches_python_replay(spark):
    from unarxive_spark.operators.corpus import tfidf_doc_pairs

    rows = [
        (1, "rare apple banana common common"),
        (2, "rare apple cherry common"),
        (3, "banana cherry common common common"),
        (4, "common only here common"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {
        (r["id_a"], r["id_b"]): (r["n_shared"], r["cosine"])
        for r in tfidf_doc_pairs(df, min_shared=1, max_df=2).collect()
    }
    docs = {d: t.lower().split() for d, t in rows}
    n = len(docs)
    vocab = {t for ts in docs.values() for t in ts}
    dfreq = {
        t: sum(1 for ts in docs.values() if t in ts) for t in vocab
    }
    w = {
        d: {
            t: ts.count(t) * math.log(n / dfreq[t])
            for t in set(ts)
        }
        for d, ts in docs.items()
    }
    norm = {
        d: math.sqrt(sum(x * x for x in ws.values()))
        for d, ws in w.items()
    }
    want = {}
    for a in docs:
        for b in docs:
            if a >= b:
                continue
            shared = [
                t
                for t in set(docs[a]) & set(docs[b])
                if dfreq[t] <= 2  # the pair-generation index prune
            ]
            if len(shared) < 1:
                continue
            dot = sum(w[a][t] * w[b][t] for t in shared)
            want[(a, b)] = (
                len(shared),
                round(dot / (norm[a] * norm[b]), 6),
            )
    assert got == want
    # 'common' (df=4) must never generate a pair on its own: doc 4
    # shares only 'common' with the others and must be absent
    assert not any(4 in pair for pair in got)


def test_duplicate_spans_finds_planted_repeats(spark):
    from unarxive_spark.operators.corpus import duplicate_spans

    shared = "one two three four five"
    rows = [
        (1, f"{shared} alpha beta gamma"),
        (2, f"delta {shared} epsilon"),          # shares the 5-gram
        (3, "totally unrelated text goes here"),
        (4, "totally unrelated text goes here"),  # exact dup of 3
        (5, "short"),                             # < window: whole-doc hash
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {
        r["doc_id"]: (r["n_windows"], r["n_dup_windows"], r["dup_frac"])
        for r in duplicate_spans(df, window=5).collect()
    }
    # docs 1+2 share exactly one 5-token window; 3+4 are whole-doc dups
    toks = {d: t.split() for d, t in rows}
    for d in (1, 2, 3, 4, 5):
        assert got[d][0] == max(len(toks[d]) - 5, 0) + 1
    assert got[1][1] == 1 and got[2][1] == 1
    assert got[3] == (1, 1, 1.0) and got[4] == (1, 1, 1.0)
    assert got[5] == (1, 0, 0.0)
    assert got[1][2] == round(1 / got[1][0], 6)


# --- BPE merge learning -------------------------------------------------

BPE_DOCS = [
    (1, "l o w l o w e r l o w e s t"),
    (2, "n e w n e w e r n e w e s t"),
    (3, "w i d e w i d e r w i d e s t"),
]


def _bpe_replay(docs, n_merges):
    """Greedy corpus-level BPE: count adjacent pairs, merge the
    (count desc, a asc, b asc) argmax left-to-right non-overlapping."""
    state = [d.lower().split() for _, d in docs if d.split()]
    rules = []
    for rank in range(1, n_merges + 1):
        counts = {}
        for toks in state:
            for a, b in zip(toks, toks[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + 1
        if not counts:
            return rules, state, True
        (a, b), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        rules.append((rank, a, b, c))
        new_state = []
        for toks in state:
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            new_state.append(out)
        state = new_state
    return rules, state, False


def test_bpe_merges_matches_greedy_replay(spark):
    from unarxive_spark.operators.corpus import bpe_merges

    df = spark.createDataFrame(BPE_DOCS, SCHEMA)
    got = [
        (r["merge_rank"], r["token_a"], r["token_b"], r["pair_count"])
        for r in bpe_merges(df, n_merges=6).orderBy("merge_rank").collect()
    ]
    want, _, _ = _bpe_replay(BPE_DOCS, 6)
    assert got == want


def test_bpe_merges_overlap_is_left_to_right(spark):
    """[a,a,a] under merge (a,a) must become [aa,a], not [a,aa]."""
    from unarxive_spark.operators.corpus import bpe_merges, bpe_segment

    df = spark.createDataFrame([(1, "a a a")], SCHEMA)
    rules = bpe_merges(df, n_merges=1).collect()
    assert [(r["token_a"], r["token_b"], r["pair_count"]) for r in rules] == [
        ("a", "a", 2)
    ]
    seg = bpe_segment(df, [("a", "a")]).collect()
    assert seg[0]["bpe_tokens"] == ["aa", "a"]
    assert seg[0]["n_bpe_tokens"] == 2


def test_bpe_merges_exhaustion_raises(spark):
    from unarxive_spark.operators.corpus import bpe_merges

    df = spark.createDataFrame([(1, "solo"), (2, "alone")], SCHEMA)
    with pytest.raises(ValueError, match="exhausted"):
        bpe_merges(df, n_merges=1)


def test_bpe_segment_applies_learned_merges(spark):
    from unarxive_spark.operators.corpus import bpe_merges, bpe_segment

    df = spark.createDataFrame(BPE_DOCS, SCHEMA)
    rules = bpe_merges(df, n_merges=6).orderBy("merge_rank").collect()
    merges = [(r["token_a"], r["token_b"]) for r in rules]
    got = {
        r["doc_id"]: (r["bpe_tokens"], r["n_bpe_tokens"])
        for r in bpe_segment(df, merges).collect()
    }
    _, state, _ = _bpe_replay(BPE_DOCS, 6)
    for (did, _), toks in zip(BPE_DOCS, state):
        assert got[did] == (toks, len(toks))
    # merges actually compressed the stream
    assert all(
        got[did][1] < len(text.split()) for did, text in BPE_DOCS
    )


def test_unigram_lm_scores_matches_replay(spark):
    """Laplace unigram LM cross-entropy replayed in pure Python."""
    from unarxive_spark.operators.corpus import unigram_lm_scores

    df = spark.createDataFrame(DOCS, SCHEMA)
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["cross_entropy"],
            r["perplexity"],
        )
        for r in unigram_lm_scores(df).collect()
    }
    toks = {d: t.lower().split() for d, t in DOCS}
    cnt = {}
    for ts in toks.values():
        for t in ts:
            cnt[t] = cnt.get(t, 0) + 1
    n_total, vocab = sum(cnt.values()), len(cnt)
    lnz = math.log(n_total + vocab)
    want = {}
    for d, ts in toks.items():
        n = len(ts)
        s = sum(math.log(cnt[t] + 1) for t in ts)
        ce = (n * lnz - s) / n
        want[d] = (n, round(ce, 6), round(math.exp(ce), 6))
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == want[d][0]
        assert got[d][1] == pytest.approx(want[d][1], abs=2e-6)
        assert got[d][2] == pytest.approx(want[d][2], abs=2e-5)
    # in DOCS every token is a corpus hapax (c=1), so all docs share
    # ce = ln(N+V) - ln 2 — a strong parity pin on the scalar math
    assert len({v[1] for v in got.values()}) == 1
    # frequency ordering: on a corpus with repeats, a doc of frequent
    # tokens must score lower cross-entropy than a hapax-heavy one
    mixed = BPE_DOCS + [(9, "qq rr ss tt uu vv ww xx yy zz")]
    got2 = {
        r["doc_id"]: r["cross_entropy"]
        for r in unigram_lm_scores(
            spark.createDataFrame(mixed, SCHEMA)
        ).collect()
    }
    assert got2[9] > max(got2[d] for d, _ in BPE_DOCS)


def test_skipgram_pmi_matches_python_replay(spark):
    import math
    from collections import Counter

    from unarxive_spark.operators.corpus import skipgram_pmi

    docs = [
        "a b c a b",
        "b c a b a",
        "c a b a b c",
        "x",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    W = 2
    cu, cp, n_uni, n_pairs = Counter(), Counter(), 0, 0
    for t in docs:
        ts = t.split()
        n_uni += len(ts)
        cu.update(ts)
        for o in range(1, W + 1):
            for i in range(len(ts) - o):
                cp[(ts[i], ts[i + o])] += 1
                n_pairs += 1
    want = {}
    for (a, b), c_ab in cp.items():
        if c_ab >= 2:
            pmi = math.log(
                (c_ab * n_uni * n_uni) / (n_pairs * cu[a] * cu[b])
            )
            want[(a, b)] = (c_ab, cu[a], cu[b], round(pmi, 6))
    got = {
        (r.token_a, r.token_b): (r.c_ab, r.c_a, r.c_b, r.pmi)
        for r in skipgram_pmi(df, window=W, min_count=2).collect()
    }
    assert got == want
    # a distance-2 pair adjacent bigrams can't produce must be present
    assert ("a", "a") in got or ("b", "b") in got or ("c", "b") in got


def test_skipgram_window1_equals_bigram_row_set(spark):
    from unarxive_spark.operators.corpus import bigram_pmi, skipgram_pmi

    df = spark.createDataFrame(
        [(0, "a b a b a"), (1, "b a b a")], "doc_id long, text string"
    )
    sg = {
        (r.token_a, r.token_b): r.c_ab
        for r in skipgram_pmi(df, window=1, min_count=1).collect()
    }
    bg = {
        (r.token_a, r.token_b): r.c_ab
        for r in bigram_pmi(df, min_count=1).collect()
    }
    assert sg == bg


def test_dsir_scores_prefers_target_like_docs(spark):
    from unarxive_spark.operators.corpus import dsir_scores

    rows = []
    # target slice: "wiki"-like vocabulary
    for i in range(20):
        rows.append((i, "science theory proof lemma axiom", True))
    # pool: 5 target-like docs and 15 junk docs
    for i in range(20, 25):
        rows.append((i, "theory proof lemma science axiom", False))
    for i in range(25, 40):
        rows.append((i, "spam click buy cheap now", False))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, is_target boolean"
    )
    out = {r.doc_id: r for r in dsir_scores(df).collect()}
    assert set(out) == set(range(20, 40))  # pool docs only
    target_like = [out[i].score_e6 for i in range(20, 25)]
    junk = [out[i].score_e6 for i in range(25, 40)]
    assert min(target_like) > max(junk)
    # exact-integer contract: score is the BIGINT sum / 1e6
    for r in out.values():
        assert r.score == round(r.score_e6 / 1e6, 6)


def test_dsir_empty_target_is_uniformly_flat(spark):
    from unarxive_spark.operators.corpus import dsir_scores

    df = spark.createDataFrame(
        [(0, "a b", False), (1, "c d", False)],
        "doc_id long, text string, is_target boolean",
    )
    out = dsir_scores(df).collect()
    # with no target tokens every bucket weight is ln((1*(Tr+B))/((cr+1)*B))
    # — finite, defined; both docs score without error
    assert {r.doc_id for r in out} == {0, 1}


def test_top_phrase_occurrences_argmax_and_positions(spark):
    from unarxive_spark.operators.corpus import top_phrase_occurrences

    df = spark.createDataFrame(
        [
            (0, "the quick fox the quick fox jumps"),
            (1, "the quick fox again"),
            (2, "zz yy xx"),
            (3, "ab"),  # shorter than n: no grams
        ],
        "doc_id long, text string",
    )
    out = top_phrase_occurrences(df, n=3).collect()
    assert all(r.phrase == "the quick fox" for r in out)
    assert all(r.n_total == 3 for r in out)
    assert {(r.doc_id, r.pos) for r in out} == {(0, 0), (0, 3), (1, 0)}


def test_top_phrase_tie_breaks_lexicographically(spark):
    from unarxive_spark.operators.corpus import top_phrase_occurrences

    df = spark.createDataFrame(
        [(0, "b b b"), (1, "a a a")], "doc_id long, text string"
    )
    out = top_phrase_occurrences(df, n=3).collect()
    assert len(out) == 1 and out[0].phrase == "a a a"


def test_textrank_hub_word_ranks_first(spark):
    """A word adjacent to every other word is the co-occurrence hub and
    must out-rank the leaves (PageRank over the word graph)."""
    from unarxive_spark.plans.tabular_queries import q_textrank_keywords
    import os
    import tempfile

    rows = [
        (1, "hub alpha hub beta hub gamma hub delta", "en", 40),
        (2, "hub epsilon hub zeta", "en", 20),
    ]
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, n_chars int"
        ).write.parquet(os.path.join(td, "documents.parquet"))
        out = q_textrank_keywords(spark, td).collect()
    assert out[0].word == "hub"
    assert {r.word for r in out} == {
        "hub", "alpha", "beta", "gamma", "delta", "epsilon", "zeta",
    }
