"""Notion block → markdown fold (notion_connector.py:297-622):
operator output vs a direct Python mirror of the reference functions
over dict block trees."""

from __future__ import annotations

import hashlib


# -- faithful sync mirror of the reference conversion --------------------------
# (_block_to_markdown :346-577, _fetch_table_content :579-622,
#  _fetch_page_content :337-344 — children supplied inline)


def _rich(s):
    return s or ""


def _table_content(children):
    rows = children or []
    if not rows:
        return "[Empty table]"
    table_lines = []
    for i, row in enumerate(rows):
        if row.get("type") == "table_row":
            cell_texts = [(_rich(c)) for c in row.get("cells", [])]
            table_lines.append("| " + " | ".join(cell_texts) + " |")
            if i == 0:
                table_lines.append(
                    "|" + "|".join([" --- " for _ in cell_texts]) + "|"
                )
    return "\n".join(table_lines) if table_lines else "[Empty table]"


def _block_md(b):
    t = b["type"]
    kids = b.get("children", [])
    if t == "link_preview":
        url = b.get("url", "")
        return f"[Link: {url}]({url})" if url else "[Link]"
    if t == "table":
        if b.get("has_children"):
            return _table_content(kids)
        return "[Empty table]"
    if t == "paragraph":
        return _rich(b.get("text"))
    if t in ("heading_1", "heading_2", "heading_3"):
        level = int(t[-1])
        text = _rich(b.get("text"))
        nested = [m for m in (_block_md(k) for k in kids) if m]
        result = f"{'#' * level} {text}"
        if nested:
            result += "\n\n" + "\n\n".join(nested)
        return result
    if t in ("bulleted_list_item", "to_do", "toggle", "numbered_list_item"):
        text = _rich(b.get("text"))
        pad = "   " if t == "numbered_list_item" else "  "
        nested = []
        for k in kids:
            m = _block_md(k)
            if m:
                nested.append("\n".join(f"{pad}{line}" for line in m.split("\n")))
        if t == "bulleted_list_item":
            head = f"- {text}"
        elif t == "numbered_list_item":
            head = f"1. {text}"
        elif t == "to_do":
            head = f"- [{'x' if b.get('checked') else ' '}] {text}"
        else:
            head = f"▼ {text}"
        if nested:
            head += "\n" + "\n".join(nested)
        return head
    if t == "quote":
        return f"> {_rich(b.get('text'))}"
    if t == "code":
        return f"```{b.get('language', '')}\n{_rich(b.get('text'))}\n```"
    if t == "divider":
        return "---"
    if t == "child_page":
        return f"[{b.get('title', 'Untitled')}](notion://{b['id']})"
    if t == "child_database":
        return f"[{b.get('title', 'Database')}](notion://{b['id']})"
    if t == "image":
        return f"![{_rich(b.get('caption'))}](image)"
    if t == "video":
        return f"[Video: {_rich(b.get('caption'))}](video)"
    if t == "file":
        return f"[File: {_rich(b.get('caption'))}](file)"
    if t == "pdf":
        return f"[PDF: {_rich(b.get('caption'))}](pdf)"
    if t == "bookmark":
        url, caption = b.get("url", ""), _rich(b.get("caption"))
        return f"[{caption or url}]({url})"
    if t == "embed":
        return f"[Embed]({b.get('url', '')})"
    if t == "table_of_contents":
        return "[Table of Contents]"
    if t == "link_to_page":
        return f"[Link to page](notion://{b.get('ref_id', '')})"
    if t == "table_row":
        return ""
    return f"[{t}]"


def _page_md(blocks):
    lines = [m for m in (_block_md(b) for b in blocks) if m]
    return "\n\n".join(lines)


# -- tree → flat block table ---------------------------------------------------

SCHEMA = (
    "page_id string, block_id string, parent_id string, pos int, "
    "block_type string, text string, checked boolean, language string, "
    "url string, ref_id string, title string, caption string, "
    "cells array<string>, has_children boolean"
)


def _flatten(page_id, blocks, parent=None, rows=None):
    rows = rows if rows is not None else []
    for pos, b in enumerate(blocks):
        rows.append(
            (
                page_id, b["id"], parent, pos, b["type"], b.get("text"),
                b.get("checked"), b.get("language"), b.get("url"),
                b.get("ref_id"), b.get("title"), b.get("caption"),
                b.get("cells"), bool(b.get("children")) or b.get(
                    "has_children", False
                ),
            )
        )
        _flatten(page_id, b.get("children", []), b["id"], rows)
    return rows


TREE = [
    {"id": "h1", "type": "heading_1", "text": "Title", "children": [
        {"id": "p1", "type": "paragraph", "text": "intro text"},
        {"id": "q1", "type": "quote", "text": "wise words"},
    ]},
    {"id": "p2", "type": "paragraph", "text": ""},          # skipped
    {"id": "b1", "type": "bulleted_list_item", "text": "item", "children": [
        {"id": "b2", "type": "bulleted_list_item", "text": "sub",
         "children": [
             {"id": "p3", "type": "paragraph", "text": "deep"},
         ]},
    ]},
    {"id": "n1", "type": "numbered_list_item", "text": "first", "children": [
        {"id": "p4", "type": "paragraph", "text": "li\nnes"},
    ]},
    {"id": "t1", "type": "to_do", "text": "ship it", "checked": True},
    {"id": "g1", "type": "toggle", "text": "spoiler", "children": [
        {"id": "p5", "type": "paragraph", "text": ""},       # skipped child
        {"id": "d1", "type": "divider"},
    ]},
    {"id": "tb1", "type": "table", "has_children": True, "children": [
        {"id": "r1", "type": "table_row", "cells": ["a", "b"]},
        {"id": "r2", "type": "table_row", "cells": ["c", "d"]},
    ]},
    {"id": "tb2", "type": "table", "has_children": False},
    {"id": "tb3", "type": "table", "has_children": True, "children": [
        {"id": "x1", "type": "paragraph", "text": "stray"},   # i==0 not a row
        {"id": "r3", "type": "table_row", "cells": ["e"]},
    ]},
    {"id": "c1", "type": "code", "text": "print(1)", "language": "python"},
    {"id": "bm1", "type": "bookmark", "url": "http://u", "caption": ""},
    {"id": "bm2", "type": "bookmark", "url": "http://u", "caption": "cap"},
    {"id": "lp1", "type": "link_preview", "url": "http://l"},
    {"id": "lp2", "type": "link_preview"},
    {"id": "cp1", "type": "child_page", "title": "Sub"},
    {"id": "im1", "type": "image", "caption": "pic"},
    {"id": "lk1", "type": "link_to_page", "ref_id": "pg9"},
    {"id": "uk1", "type": "callout"},
    {"id": "toc", "type": "table_of_contents"},
]


def test_page_markdown_matches_reference_mirror(spark):
    from cocoindex_data_ingestion_spark.operators.notion import (
        pages_markdown,
    )

    rows = _flatten("pageA", TREE)
    df = spark.createDataFrame(rows, SCHEMA)
    got = pages_markdown(df, max_depth=3).collect()
    assert len(got) == 1
    expected = _page_md(TREE)
    assert got[0]["content"] == expected
    assert got[0]["content_hash"] == hashlib.sha256(
        expected.encode()
    ).hexdigest()


def test_separator_quirk_and_indents():
    # sanity-pin the mirror itself on the known quirks
    md = _block_md(TREE[8])  # tb3: first child not a table_row
    assert md == "| e |"     # no separator line (i==0 was the stray)
    md2 = _block_md(TREE[6])
    assert md2 == "| a | b |\n| --- | --- |\n| c | d |"
    bullet = _block_md(TREE[2])
    assert bullet == "- item\n  - sub\n    deep"
    numbered = _block_md(TREE[3])
    assert numbered == "1. first\n   li\n   nes"
