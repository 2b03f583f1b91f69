"""Structured-record extraction (title / h1-h3 headings / meta) — the
reference's listing-page parse products ([P], SURVEY.md §1.1), additive to
the byte-identity text/link pass (same single parse, kernels/textextract).
"""

from __future__ import annotations

from fixtures.gen import TINY, fixture_bundle
from indigo_crawler_spark.kernels.textextract import (
    extract_all,
    extract_fields,
    extract_text_and_links,
)


class TestKernelFields:
    def test_basic_fields(self):
        html = (
            b'<html><head><title>My  Page </title>'
            b'<meta name="lang" content="en"><meta name="lang" content="zh">'
            b'<meta charset="utf-8"><meta name="empty" content="">'
            b"</head><body><h1>Top <b>Story</b></h1><p>body</p>"
            b"<h2>Sub</h2><h3>Deep</h3><h4>ignored</h4></body></html>"
        )
        title, headings, meta = extract_fields(html)
        assert title == "My Page"  # whitespace collapsed
        assert headings == ["Top Story", "Sub", "Deep"]  # h1-h3, doc order
        assert meta == {"lang": "en", "empty": ""}  # first wins; no-name skipped

    def test_missing_title_and_script_skip(self):
        html = b"<html><body><script>var t='<h1>fake</h1>'</script><h2>Real</h2></body></html>"
        title, headings, meta = extract_fields(html)
        assert title == ""
        assert headings == ["Real"]
        assert meta == {}

    def test_unclosed_title_stops_at_next_tag(self):
        """Truncated real-world HTML: a <title> that never closes must not
        swallow the rest of the document — any non-inline tag ends it. The
        text byte stream is the same with or without the missing </title>."""
        from indigo_crawler_spark.kernels.textextract import extract_text_and_links

        broken = b"<html><head><title>My Page<body><p>Body text</p><h1>H</h1></body></html>"
        title, headings, meta = extract_fields(broken)
        assert title == "My Page"
        assert headings == ["H"]
        fixed = broken.replace(b"<title>My Page", b"<title>My Page</title>")
        assert extract_text_and_links(broken, None)[0] == \
            extract_text_and_links(fixed, None)[0]
        # </head> right after the unclosed title also force-closes it
        t2, _, _ = extract_fields(b"<head><title>My Page</head><body>Body</body>")
        assert t2 == "My Page"

    def test_end_tag_closes_title_and_flushes_open_heading(self):
        """<h1><title>x</h1>: the </h1> both force-closes the unclosed title
        AND flushes the open heading — the two closes must not shadow each
        other (review finding: an elif chain dropped the heading forever and
        accumulated the rest of the document into it)."""
        t, h, _ = extract_fields(b"<h1><title>My page</h1><p>Body text</p>")
        assert t == "My page"
        assert h == ["My page"]

    def test_rcdata_style_title_keeps_inline_text(self):
        """Inline formatting inside a title is kept as title TEXT (a
        browser's RCDATA title keeps the markup verbatim; collecting the
        data pieces is the closest element-parse reading — ADVICE r4), while
        structural tags still force-close the runaway case above."""
        t, _, _ = extract_fields(b"<title>a <b>c</b> d</title><p>body</p>")
        assert t == "a c d"
        # the force-close still wins over a runaway even with inline noise
        t, _, _ = extract_fields(b"<title>a <b>c</b><div>rest of doc")
        assert t == "a c"

    def test_none_and_invalid_utf8(self):
        assert extract_fields(None) == ("", [], {})
        t, h, m = extract_fields(b"<title>ok</title>\xff\xfe")
        assert t == "ok"

    def test_extract_all_text_links_byte_identical_to_f7(self):
        """Fields are additive: the (text, links) halves of extract_all must
        be byte-identical to extract_text_and_links on every fixture page
        (incl. the invalid-UTF-8 and relative-href cohorts)."""
        for row in fixture_bundle(**TINY)["pages"]:
            base = row["url"].lower()
            t1, l1 = extract_text_and_links(row["html"], base)
            t2, l2, title, headings, meta = extract_all(row["html"], base)
            assert (t1, l1) == (t2, l2)
            # fixture html embeds <title>T{i}</title> and <h1>H{i}</h1>
            assert title.startswith("T") and headings and headings[0].startswith("H")


class TestOperatorFields:
    def test_engine_fields_equal_kernel_per_page(self, spark):
        """T2-style field equality: the Spark operator's structured record
        per url == the shared kernel called per page (the oracle's view)."""
        from indigo_crawler_spark.operators.extract import extract_pages_with_fields
        from indigo_crawler_spark.plans import schemas as _s  # noqa: F401

        pages = fixture_bundle(**TINY)["pages"]
        rows = [(r["url"], 0, r["html"]) for r in pages]
        df = spark.createDataFrame(
            rows, "canon_url string, depth int, html binary"
        )
        got = {
            r["canon_url"]: (r["text"], r["links"], r["title"], r["headings"], r["meta"])
            for r in extract_pages_with_fields(df).collect()
        }
        assert len(got) == len({r["url"] for r in pages})
        for r in pages:
            text, links, title, headings, meta = extract_all(r["html"], r["url"])
            g = got[r["url"]]
            assert g[0] == text and list(g[1]) == links, r["url"]
            assert g[2] == title and list(g[3]) == headings, r["url"]
            assert dict(g[4]) == meta, r["url"]
