"""Unit tests for the Ollama-backed Embedder/Extractor HTTP clients
(reference backend/src/embeddings.py:12-43, structured_data.py:57-109) —
request construction and failure degradation, exercised through an
injected transport exactly as the reference's tests mock requests
(backend/tests/test_tasks.py:6-15). No network is ever touched."""

from __future__ import annotations

import json

import pytest

from crawler_spark.functions.embedding import OllamaEmbedder, RetryingEmbedder
from crawler_spark.functions.extraction import OllamaExtractor, StubExtractor


class Transport:
    """Records (url, payload) calls; replays scripted responses."""

    def __init__(self, responses):
        self.responses = list(responses)
        self.calls: list[tuple[str, dict]] = []

    def __call__(self, url, payload):
        self.calls.append((url, payload))
        out = self.responses.pop(0)
        if isinstance(out, Exception):
            raise out
        return out


class TestOllamaEmbedder:
    def test_text_request_shape(self):
        t = Transport([{"embedding": [1.0, 2.0, 3.0]}])
        emb = OllamaEmbedder(base_url="http://m.test:11434", transport=t)
        assert emb.embed_text("hello world") == [1.0, 2.0, 3.0]
        url, payload = t.calls[0]
        assert url == "http://m.test:11434/api/embeddings"
        assert payload == {"model": "llama3.2:latest", "prompt": "hello world"}

    def test_vision_request_carries_base64_images(self):
        t = Transport([{"embedding": [0.5]}])
        emb = OllamaEmbedder(transport=t)
        assert emb.embed_vision("QkFTRTY0") == [0.5]
        _, payload = t.calls[0]
        assert payload["model"] == "llava"
        assert payload["images"] == ["QkFTRTY0"]

    def test_transport_error_propagates_for_retry_wrapper(self):
        t = Transport([RuntimeError("conn refused"), {"embedding": [1.0]}])
        emb = RetryingEmbedder(OllamaEmbedder(transport=t), max_retries=2)
        assert emb.embed_text("x") == [1.0]  # D4: retried past the failure
        assert len(t.calls) == 2


class TestOllamaExtractor:
    def test_chat_request_shape_and_json_roundtrip(self):
        reply = {"message": {"content": json.dumps({"product_name": "widget"})}}
        t = Transport([reply])
        ext = OllamaExtractor(transport=t)
        got = json.loads(ext.extract("ecommerce", "page content"))
        assert got == {"product_name": "widget"}
        url, payload = t.calls[0]
        assert url.endswith("/api/chat")
        assert payload["format"] == "json" and payload["stream"] is False
        assert "product_name" in payload["messages"][0]["content"]  # F10 prompt
        assert "page content" in payload["messages"][0]["content"]

    @pytest.mark.parametrize(
        "response",
        [
            RuntimeError("timeout"),                      # transport failure
            {"message": {"content": "not json at all"}},  # malformed reply
            {"message": {"content": "[1, 2, 3]"}},        # non-dict JSON
            {"unexpected": "shape"},                      # missing message key
        ],
    )
    def test_any_failure_degrades_to_empty_dict(self, response):
        ext = OllamaExtractor(transport=Transport([response]))
        assert ext.extract("ecommerce", "content") == "{}"

    def test_null_content_short_circuits(self):
        t = Transport([])
        assert OllamaExtractor(transport=t).extract("ecommerce", None) == "{}"
        assert t.calls == []  # reference never calls the model on None

    def test_same_interface_as_stub(self):
        """Same duck-typed interface as StubExtractor — extract_udf and
        finalize_pages accept either without change: extract(schema,
        content) -> JSON-object string in both."""
        reply = {"message": {"content": json.dumps({"sku": "A1"})}}
        ext = OllamaExtractor(transport=Transport([reply]))
        stub = StubExtractor()
        for impl in (ext, stub):
            out = impl.extract("ecommerce", "c")
            assert isinstance(out, str) and isinstance(json.loads(out), dict)
