"""Property-based tests (hypothesis) over the pure-Python cores — these are
the functions the engine↔oracle agreement rests on, so fuzz them."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from axora_spark.functions import urlnorm
from axora_spark.functions.quality import quality_score_py
from axora_spark.functions.textproc import porter2_stem
from axora_spark.operators.bloom import Bloom
from axora_spark.operators.chunking import (chunk_sentence_py,
                                            chunk_markdown_py, token_count_py)
from axora_spark.operators.spans import md_to_spans

url_st = st.one_of(
    st.text(max_size=80),
    st.builds(lambda h, p, q: f"https://{h}.example.org/{p}" + (f"?{q}" if q else ""),
              st.text(alphabet="abcxyz", min_size=1, max_size=8),
              st.text(alphabet="abc/._-%09", max_size=20),
              st.text(alphabet="ab=&1", max_size=10)))


@given(url_st)
@settings(max_examples=300, deadline=None)
def test_canonicalize_idempotent(u):
    c = urlnorm.canonicalize(u)
    assert urlnorm.canonicalize(c) == c


@given(url_st)
@settings(max_examples=200, deadline=None)
def test_skip_norm_no_underscore_or_dot(u):
    p = urlnorm.skip_norm_path(u)
    assert "_" not in p and "." not in p
    assert p == p.lower()


@given(st.text(max_size=3000))
@settings(max_examples=150, deadline=None)
def test_quality_score_bounded(t):
    s = quality_score_py(t)
    assert 0.0 <= s <= 100.0


@given(st.text(max_size=2000))
@settings(max_examples=100, deadline=None)
def test_sentence_chunker_invariants(t):
    chunks = chunk_sentence_py(t)
    for c in chunks:
        assert c == c.strip() and c
    assert chunks == chunk_sentence_py(t)  # deterministic


@given(st.text(alphabet=st.characters(blacklist_categories=("Cs",)),
               max_size=2000))
@settings(max_examples=100, deadline=None)
def test_markdown_chunker_total(t):
    # never raises, always returns a list of non-empty strings
    for c in chunk_markdown_py(t):
        assert c and c == c.strip()


@given(st.text(max_size=500))
@settings(max_examples=200, deadline=None)
def test_token_count_nonnegative(t):
    assert token_count_py(t) >= 0


@given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz'", min_size=1, max_size=30))
@settings(max_examples=300, deadline=None)
def test_stemmer_total_and_stable(w):
    s = porter2_stem(w)
    assert isinstance(s, str)
    assert porter2_stem(w) == s
    # a stem never grows beyond the word by more than the 'e' restorations
    assert len(s) <= len(w) + 1


@given(st.text(max_size=1500))
@settings(max_examples=100, deadline=None)
def test_spans_offsets_sequential(md):
    spans = md_to_spans(md)
    assert [s["offset"] for s in spans] == list(range(len(spans)))
    for s in spans:
        if s["kind"] == "text":
            assert s["media_ref"] == "" and s["text"]
        else:
            assert s["text"] == "" and s["media_ref"]


@given(st.lists(st.integers(min_value=-2**63, max_value=2**63 - 1),
                min_size=1, max_size=2000, unique=True))
@settings(max_examples=50, deadline=None)
def test_bloom_no_false_negatives_prop(keys):
    arr = np.array(keys, dtype=np.int64)
    b = Bloom.sized(len(arr))
    b.add_many(arr)
    assert b.contains_many(arr).all()


# ---- raw-HTML stage robustness (round 2: operators/html.py) ----

_html_st = st.one_of(
    st.text(max_size=200),  # arbitrary soup, incl. unbalanced angle brackets
    st.builds(
        lambda tag, attr, txt, tail:
            f"<{tag} href=\"{attr}\"><p>{txt}</p></{tag}>{tail}",
        st.sampled_from(["a", "div", "p", "main", "nav", "x-custom"]),
        st.text(alphabet="ab/:._-", max_size=20),
        st.text(max_size=40),
        st.text(max_size=30)),
)


@given(_html_st)
@settings(max_examples=300, deadline=None)
def test_parse_page_never_crashes_and_shapes_hold(html):
    from axora_spark.operators.html import parse_page
    p = parse_page(html)
    assert isinstance(p["out_links"], list)
    assert all(isinstance(x, str) for x in p["out_links"])
    assert isinstance(p["body_md"], str)
    assert isinstance(p["title"], str)
    m = p["metadata"]
    assert set(m) >= {"title", "author", "fingerprint", "raw_metadata"}
    assert len(m["fingerprint"]) == 64


@given(st.lists(st.text(alphabet="ab/:._-", min_size=1, max_size=20),
                max_size=8))
@settings(max_examples=200, deadline=None)
def test_links_roundtrip_through_anchors(hrefs):
    from axora_spark.operators.html import escape, parse_dom, extract_links
    html = "<body>" + "".join(
        f'<a href="{escape(h)}">t</a>' for h in hrefs) + "</body>"
    assert extract_links(parse_dom(html)) == hrefs


@given(st.text(max_size=300))
@settings(max_examples=200, deadline=None)
def test_escaped_text_roundtrips_through_paragraph(txt):
    """escape -> <p> -> parse -> markdown returns the whitespace-collapsed
    text (the html_main_md oracle's core assumption)."""
    import re
    from axora_spark.operators.html import (escape, html_to_markdown,
                                            parse_dom)
    md = html_to_markdown(parse_dom(f"<body><p>{escape(txt)}</p></body>"))
    assert md == re.sub(r"\s+", " ", txt).strip()


@given(st.integers(min_value=-2**63, max_value=2**63 - 1),
       st.integers(min_value=0, max_value=10_000))
@settings(max_examples=300, deadline=None)
def test_mix_draw_python_model_bounded(doc_id, epoch):
    # pure-Python model of operators/mixing.mix_draw: every intermediate
    # stays under 2^63 for ANY int64 doc_id and sane epoch (the ADVICE
    # r4 overflow class), and the draw is a uniform in [0, 1)
    from axora_spark.operators.mixing import (EPOCH_PRIME, MIX_HASH,
                                              MIX_MOD)
    key0 = doc_id % 2**31                       # pmod: non-negative
    assert 0 <= key0 < 2**31
    key = (key0 + epoch * EPOCH_PRIME) % 2**31
    prod = key * MIX_HASH
    assert prod < 2**63                         # never wraps int64
    u = prod % MIX_MOD / MIX_MOD
    assert 0.0 <= u < 1.0


@given(st.lists(st.text(alphabet="abcdef", min_size=1, max_size=6),
                min_size=0, max_size=40),
       st.integers(min_value=2, max_value=8))
@settings(max_examples=150, deadline=None)
def test_ngram_python_model_count(words, n):
    # the zip_with fold in operators/decontam.ngrams_of_words emits
    # exactly max(0, len-n+1) n-grams, each the space-join of a window —
    # pin the python model the SQL oracle and the Spark fold both mirror
    grams = [" ".join(words[i:i + n])
             for i in range(max(0, len(words) - n + 1))]
    assert len(grams) == max(0, len(words) - n + 1)
    for g in grams:
        assert g.count(" ") >= n - 1  # n words joined


@given(st.lists(st.floats(min_value=0.0, max_value=399.99,
                          allow_nan=False), min_size=1, max_size=500),
       st.sampled_from([0.5, 0.9, 0.99]))
@settings(max_examples=100, deadline=None)
def test_histogram_quantile_rank_model(vals, q):
    # python model of q_quantile_sketch's estimator: the estimate always
    # lands inside the bucket containing rank q*n, hence its empirical
    # CDF is within that bucket's mass of q
    B, W = 64, 6.25
    n = len(vals)
    cnt = [0] * B
    for v in vals:
        cnt[min(B - 1, int(v // W))] += 1
    r = q * n
    cum = 0
    for b in range(B):
        prev, cum = cum, cum + cnt[b]
        if cum >= r and cnt[b]:
            est = b * W + W * (r - prev) / cnt[b]
            break
    cdf = sum(1 for v in vals if v <= est) / n
    assert abs(cdf - q) <= cnt[b] / n + 1.0 / n
    assert b * W - 1e-9 <= est <= (b + 1) * W + 1e-9


@given(st.lists(st.text(alphabet="abcd", min_size=1, max_size=4),
                min_size=1, max_size=200))
@settings(max_examples=100, deadline=None)
def test_cms_python_model_never_underestimates(words):
    # python model of q_cms_count: min over rows of hashed counters is
    # >= the true count for every queried word, for ANY word multiset
    import hashlib
    from collections import Counter
    D, WID = 4, 64

    def col(word, i):
        h = hashlib.sha256((word + f"#cms{i}").encode()).hexdigest()
        return int(h[:8], 16) % WID

    counters = [[0] * WID for _ in range(D)]
    for w in words:
        for i in range(D):
            counters[i][col(w, i)] += 1
    true = Counter(words)
    for w, t in true.items():
        est = min(counters[i][col(w, i)] for i in range(D))
        assert est >= t


@given(st.lists(st.integers(min_value=1, max_value=5000),
                min_size=1, max_size=60),
       st.integers(min_value=8, max_value=4096))
@settings(max_examples=200, deadline=None)
def test_seq_packing_spans_tile_the_stream(toks, L):
    # pure model of q_seq_packing's block math: spans are contiguous,
    # non-overlapping, ordered, and jointly cover ceil(total/L) blocks
    off = 0
    spans = []
    for n in toks:
        fb, lb = off // L, (off + n - 1) // L
        spans.append((off, n, fb, lb))
        assert fb <= lb <= (off + n - 1) // L
        off += n
    total = off
    assert spans[-1][3] == (total - 1) // L     # last block index
    for (o1, n1, _, lb1), (o2, _, fb2, _) in zip(spans, spans[1:]):
        assert o2 == o1 + n1                     # contiguous offsets
        assert fb2 >= lb1 - 1 and fb2 <= lb1 + 1 # blocks never skip
        assert fb2 == o2 // L


@given(st.lists(st.integers(min_value=0, max_value=120_000),
                min_size=1, max_size=12),
       st.floats(min_value=1.0, max_value=60_000.0,
                 allow_nan=False, allow_infinity=False))
@settings(max_examples=200, deadline=None)
def test_adaptive_budget_model_bounds_and_monotonicity(means, floor_ms):
    # fold from the prior, then derive the budget: it must stay within
    # [min_budget, floor(num/floor)] and be antitone in latency
    from axora_spark.operators.adaptive import (budget_from_est_py,
                                                fold_latency_py)
    num = 180_000.0
    est = None
    for m in means:
        est = fold_latency_py(est, float(m), prior_ms=floor_ms / 2.0)
    b = budget_from_est_py(est, num_ms=num, min_delay_ms=floor_ms)
    assert 1 <= b
    assert b <= max(1, int(num // max(floor_ms, 1.0)) + 1)
    # doubling every observation can never RAISE the budget
    est2 = None
    for m in means:
        est2 = fold_latency_py(est2, float(m) * 2.0,
                               prior_ms=floor_ms / 2.0)
    assert budget_from_est_py(est2, num_ms=num,
                              min_delay_ms=floor_ms) <= b
