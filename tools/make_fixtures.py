"""Generate the fixture-oracle parquet tables under fixtures/.

The driver's correctness gate hash-compares each queries() entry against a
DuckDB oracle. Three operators have semantics DuckDB SQL cannot express
(greedy wordpiece over a 30k vocab, the recursive-character chunker, the
Porter2-stemmed meta-relevance gate), so their oracles are FIXTURE tables
(VERDICT r2 'Next round' #1/#4/#5): at build time the SAME pure-Python
cores the engine's UDFs call (functions/wordpiece.py,
operators/chunking.py, functions/textproc.py — reference semantics:
crawler/chunking.go:48-149, crawler/dom_handler.go:130-199) compute the
expected outputs into parquet, and the oracle SQL joins documents → the
fixture.

Keys: sha256(text) hex (DuckDB `sha256(text)` == hashlib hexdigest), NOT
doc_id — the driver tables carry DIFFERENT text for the same doc_id at
each scale factor, so each fixture covers the union of all sf dirs and the
join restricts to whichever sf the driver runs. A stale fixture (driver
regenerated testdata) surfaces as a rowcount/hash mismatch, never a silent
pass; tests/test_fixture_oracles.py regenerates in-memory and compares.

Usage: python tools/make_fixtures.py [out_dir]
"""

from __future__ import annotations

import hashlib
import os
import sys

SF_DIRS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
           "/root/testdata/sf0.1")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _sha(s: str) -> str:
    return hashlib.sha256(s.encode("utf-8")).hexdigest()


def distinct_texts(sf_dirs=SF_DIRS) -> dict[str, str]:
    """text_sha → text over the union of every sf dir's documents table."""
    import pyarrow.parquet as pq
    out: dict[str, str] = {}
    for d in sf_dirs:
        p = os.path.join(d, "documents.parquet")
        if not os.path.exists(p):
            continue
        for t in pq.read_table(p, columns=["text"]).column("text").to_pylist():
            t = t or ""
            out.setdefault(_sha(t), t)
    return out


def max_doc_id(sf_dirs=SF_DIRS) -> int:
    import pyarrow.parquet as pq
    m = 0
    for d in sf_dirs:
        p = os.path.join(d, "documents.parquet")
        if not os.path.exists(p):
            continue
        ids = pq.read_table(p, columns=["doc_id"]).column("doc_id")
        m = max(m, max(ids.to_pylist()))
    return m


def wordpiece_rows(texts: dict[str, str]) -> list[dict]:
    """Expected X10 counts: len(Encode(text, addSpecialTokens=false)) —
    chunking.go:134-136 — via the engine's own pure-Python tokenizer."""
    from axora_spark.functions import wordpiece
    if not wordpiece.available():
        raise SystemExit("tokenizer.json not reachable; cannot build the "
                         "wordpiece fixture (see functions/wordpiece.py)")
    return [{"text_sha": sha, "wp_tokens": wordpiece.count_tokens(t)}
            for sha, t in sorted(texts.items())]


def chunk_rows(texts: dict[str, str], method: str = "sen") -> list[dict]:
    """Expected C1→C4 output per text: split → per-chunk trim/drop-empty →
    real wordpiece count → 75..480 gate (chunking.go:48-149). chunk_index
    is the splitter-output position (pre-gate), exactly as
    plans/content.chunks_from_documents emits it via posexplode."""
    from axora_spark.functions import wordpiece
    from axora_spark.operators.chunking import chunk_text_py
    rows = []
    for sha, t in sorted(texts.items()):
        for i, c in enumerate(chunk_text_py(t, method)):
            c = c.strip()
            if not c:
                continue
            tc = wordpiece.count_tokens(c)
            if 75 <= tc <= 480:
                rows.append({"text_sha": sha, "chunk_index": i,
                             "chunk_sha": _sha(c), "token_count": tc})
    return rows


# --- F5/F6 meta-gate synthetic inputs (shared with queries.q_meta_gate) ---

META_GATE_TOPIC = "economy"


def meta_gate_inputs_py(doc_id: int) -> tuple[str, list[dict]]:
    """Deterministic (title, metas) per doc_id — the exact values
    queries.q_meta_gate synthesizes natively on the Spark side (pinned
    equal by tests/test_fixture_oracles.py). Mix of: stem hit via keyword
    ('economies'→'economi'), trigram-present-but-stem-miss
    ('macro-economic' is one token under the ` ,.;:!?\\n` splitter —
    dom_handler.go:138-177), description-path hit ('economical'), and
    clean misses."""
    # first keyword glues onto the title+'keywords' prefix (the reference
    # concatenates with NO separator), so the interesting word goes second
    kw = ("growth,economies", "sports,travel",
          "policy macro-economic", "weather")[doc_id % 4]
    desc = ("An economical overview" if doc_id % 5 == 0
            else "General notes")
    title = f"Doc {doc_id} briefing"
    metas = [
        {"name": "keywords", "property": "", "content": kw},
        {"name": "", "property": "og:description", "content": desc},
    ]
    return title, metas


# --- X1/X2 url canonicalization fixture (inputs:
#     axora_spark/fixture_inputs.py, shared with queries.q_url_canonicalize) ---

def url_canon_rows(n_docs: int) -> list[dict]:
    """Expected X1→X2 output: absolutize (urljoin, dom_handler.go:19-21)
    then canonicalize + the F3 skip-norm path, via the engine's own pure-
    Python urlnorm core."""
    from axora_spark.fixture_inputs import url_case_inputs_py
    from axora_spark.functions import urlnorm
    rows = []
    for doc_id in range(n_docs):
        base, href = url_case_inputs_py(doc_id)
        absu = urlnorm.absolutize(base, href)
        rows.append({"doc_id": doc_id,
                     "abs_url": absu,
                     "canonical_url": urlnorm.canonicalize(absu),
                     "skip_path": urlnorm.skip_norm_path(absu)})
    return rows


def chunk_md_rows(n_docs: int) -> list[dict]:
    """Expected C2 output per doc: the heading-hierarchy splitter alone
    (no token gate — C2 in isolation; chunking.go:48-58 'md' path)."""
    from axora_spark.fixture_inputs import md_doc_py
    from axora_spark.operators.chunking import chunk_text_py
    rows = []
    for doc_id in range(n_docs):
        for i, c in enumerate(chunk_text_py(md_doc_py(doc_id), "md")):
            rows.append({"doc_id": doc_id, "chunk_index": i,
                         "chunk_sha": _sha(c), "chunk_len": len(c)})
    return rows


def meta_gate_rows(n_docs: int) -> list[dict]:
    from axora_spark.functions.textproc import is_meta_relevant
    rows = []
    for doc_id in range(n_docs):
        title, metas = meta_gate_inputs_py(doc_id)
        rows.append({"doc_id": doc_id,
                     "relevant": is_meta_relevant(title, metas,
                                                  META_GATE_TOPIC)})
    return rows


def write(rows: list[dict], path: str, schema) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq
    cols = {f.name: [r[f.name] for r in rows] for f in schema}
    pq.write_table(pa.table(cols, schema=schema), path)
    print(f"wrote {path}: {len(rows)} rows")


def main() -> None:
    import pyarrow as pa
    out_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(__file__), "..", "fixtures")
    os.makedirs(out_dir, exist_ok=True)
    texts = distinct_texts()

    write(wordpiece_rows(texts),
          os.path.join(out_dir, "wordpiece_counts.parquet"),
          pa.schema([("text_sha", pa.string()),
                     ("wp_tokens", pa.int32())]))
    write(chunk_rows(texts),
          os.path.join(out_dir, "chunks.parquet"),
          pa.schema([("text_sha", pa.string()), ("chunk_index", pa.int32()),
                     ("chunk_sha", pa.string()),
                     ("token_count", pa.int32())]))
    n = max_doc_id() + 1
    rows = meta_gate_rows(n)
    n_rel = sum(r["relevant"] for r in rows)
    assert 0 < n_rel < n, f"degenerate meta-gate fixture: {n_rel}/{n}"
    write(rows, os.path.join(out_dir, "meta_gate.parquet"),
          pa.schema([("doc_id", pa.int64()), ("relevant", pa.bool_())]))
    write(url_canon_rows(n), os.path.join(out_dir, "url_canon.parquet"),
          pa.schema([("doc_id", pa.int64()), ("abs_url", pa.string()),
                     ("canonical_url", pa.string()),
                     ("skip_path", pa.string())]))
    md = chunk_md_rows(n)
    assert len({r["doc_id"] for r in md}) == n  # every doc chunks
    write(md, os.path.join(out_dir, "chunks_md.parquet"),
          pa.schema([("doc_id", pa.int64()), ("chunk_index", pa.int32()),
                     ("chunk_sha", pa.string()),
                     ("chunk_len", pa.int32())]))


if __name__ == "__main__":
    main()
