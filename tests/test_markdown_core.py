"""Markdown sink layout tests (markdownFormatter.effect.ts:68-166 semantics,
ported from test/markdownFormatter.test.ts expectations)."""

from scrubah_pii_spark.core.extract import clean_final_output, extract_text
from scrubah_pii_spark.core.markdown import format_to_markdown


class TestCleanFinalOutput:
    def test_ocr_stutter_removed(self):
        out = clean_final_output("Header\nHeader\nBody text")
        assert out == "Header\nBody text"

    def test_long_duplicate_lines_kept(self):
        line = "x" * 60
        out = clean_final_output(f"{line}\n{line}")
        assert out.count(line) == 2

    def test_collapse_newlines(self):
        assert clean_final_output("a\n\n\n\nb") == "a\n\nb"

    def test_rstrip_lines(self):
        assert clean_final_output("a   \nb") == "a\nb"

    def test_empty_lines_not_dropped_as_stutter(self):
        assert clean_final_output("a\n\n\nb") == "a\n\nb"


class TestFormatToMarkdown:
    def test_exact_layout(self):
        md = format_to_markdown(
            source_file="doc.pdf",
            file_size_bytes=100,
            file_type="application/pdf",
            scrubbed_text="Hello [NAME_1]",
            pii_count=1,
            processed_date_iso="2026-01-01T00:00:00.000Z",
        )
        lines = md.split("\n")
        assert lines[0] == "---"
        assert lines[1] == 'source_file: "doc.pdf"'
        assert lines[2] == "file_size_bytes: 100"
        assert "# Document Extraction" in lines
        assert lines[-1].startswith("*CONFIDENTIALITY NOTICE")
        assert "Original entities replaced: 1." in lines[-1]
        assert "hipaa_compliant: true" in md

    def test_deterministic(self):
        kw = dict(source_file="a", file_size_bytes=1, file_type="t",
                  scrubbed_text="x", pii_count=0,
                  processed_date_iso="2026-01-01T00:00:00.000Z")
        assert format_to_markdown(**kw) == format_to_markdown(**kw)


class TestExtractText:
    def test_pre_frame_roundtrip(self):
        text = "Line one\nLine two & three <kept literal>"
        html = f"<html><body><pre>{text}</pre></body></html>".encode()
        assert extract_text(html) == text

    def test_general_html(self):
        html = b"<html><head><script>var x=1;</script></head><body><p>Hello</p><p>World &amp; more</p></body></html>"
        out = extract_text(html)
        assert "Hello" in out and "World & more" in out
        assert "var x" not in out

    def test_none_and_garbage(self):
        assert extract_text(None) == ""
        assert isinstance(extract_text(b"\xff\xfe\x00garbage"), str)

    def test_idempotent_on_plain_text(self):
        t = extract_text(b"<html><body><pre>same</pre></body></html>")
        assert t == "same"
