"""Non-HTML content handlers (SURVEY.md §2.1 S6-S7).

PDF: the reference extracts per-page text with PyMuPDF
(backend/src/crawlers/file_handler.py:11-49) and drops documents whose
extracted text is empty. PyMuPDF is NOT in this image, so the real
decode is import-gated; tests use the deterministic stub format below
(the Spark-side plumbing — schema, batching, drop rules — is real and
is what we're actually testing, per the multimodal-stub policy).

Image: the reference emits a metadata-only row (content=None,
embedding_type='vision') and defers embedding (file_handler.py:52-69).
"""

from __future__ import annotations

STUB_PDF_MAGIC = b"%STUB-PDF\n"


def extract_pdf_text(body: bytes | None) -> str | None:
    """Text of a PDF, or None when empty/undecodable (reference
    file_handler.py:29-32 drops empty-text PDFs).

    Real path: PyMuPDF page-text concat. Stub path: bytes after the
    ``%STUB-PDF`` magic are the text (deterministic test fixture).
    """
    if not body:
        return None
    if body.startswith(STUB_PDF_MAGIC):
        text = body[len(STUB_PDF_MAGIC):].decode("utf-8", errors="replace").strip()
        return text or None
    try:
        import fitz  # PyMuPDF — not in this image; real deployments have it
    except ImportError:
        return None  # undecodable without the library → dropped row
    try:
        with fitz.open(stream=body, filetype="pdf") as doc:
            text = "".join(page.get_text() for page in doc).strip()
        return text or None
    except Exception:
        return None


def classify_content_type(content_type: str | None) -> str | None:
    """Content-type dispatch (reference dynamic_spider.py:34-50):
    application/pdf → pdf, image/* → image, text/html → html.
    text/plain → text is an addition beyond the reference (it drops
    everything else): a corpus pipeline ingesting WARC/exports meets
    plain-text documents constantly, and dead-lettering them loses
    exactly the rows the line-based text-cleaning tier
    (functions/text.strip_boilerplate) is built for. Anything else →
    None (dropped)."""
    if not content_type:
        return None
    ct = content_type.split(";")[0].strip().lower()
    if ct == "application/pdf":
        return "pdf"
    if ct.startswith("image/"):
        return "image"
    if ct == "text/html":
        return "html"
    if ct == "text/plain":
        return "text"
    return None
