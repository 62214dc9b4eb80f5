"""X5 span invariant: (kind, text, media_ref, order) per doc_id."""

from __future__ import annotations

from axora_spark.operators.spans import md_to_spans


def test_text_only():
    spans = md_to_spans("# Title\n\npara one.\n\npara two.")
    assert [(s["kind"], s["offset"]) for s in spans] == [
        ("text", 0), ("text", 1), ("text", 2)]
    assert spans[0]["text"] == "# Title"
    assert all(s["media_ref"] == "" for s in spans)


def test_media_block():
    spans = md_to_spans("intro\n\n![fig](https://cdn.x/a.png)\n\noutro")
    assert [(s["kind"], s["offset"]) for s in spans] == [
        ("text", 0), ("media", 1), ("text", 2)]
    assert spans[1]["media_ref"] == "https://cdn.x/a.png"
    assert spans[1]["text"] == ""


def test_inline_media_splits_paragraph():
    spans = md_to_spans("before ![x](/img/i.svg) after",
                        base_url="https://h.com/page/1")
    assert [(s["kind"], s["text"], s["media_ref"]) for s in spans] == [
        ("text", "before", ""),
        ("media", "", "https://h.com/img/i.svg"),   # relative ref absolutized
        ("text", "after", ""),
    ]
    assert [s["offset"] for s in spans] == [0, 1, 2]


def test_empty_and_whitespace():
    assert md_to_spans("") == []
    assert md_to_spans("\n\n  \n\n") == []


def test_offsets_are_sequential_order():
    md = "a\n\n![i](u1)\n\nb ![j](u2) c\n\nd"
    spans = md_to_spans(md)
    assert [s["offset"] for s in spans] == list(range(len(spans)))
    assert [s["kind"] for s in spans] == [
        "text", "media", "text", "media", "text", "text"]
