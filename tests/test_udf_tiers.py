"""Model-tier plumbing: presidio engines must be constructed once per
process (module-level lazy singletons), never per row."""

from __future__ import annotations

import sys
import types

from ndl_core_data_pipeline_spark.functions import udfs


def test_presidio_engines_built_once(monkeypatch):
    counts = {"analyzer": 0, "anonymizer": 0}

    class FakeAnalyzer:
        def __init__(self):
            counts["analyzer"] += 1

        def analyze(self, text, entities, language):
            return []

    class FakeAnonymized:
        def __init__(self, text):
            self.text = text.replace("a@b.com", "xxx@xxx.xx")

    class FakeAnonymizer:
        def __init__(self):
            counts["anonymizer"] += 1

        def anonymize(self, text, analyzer_results, operators):
            return FakeAnonymized(text)

    class FakeOperatorConfig:
        def __init__(self, *args, **kwargs):
            pass

    mod_a = types.ModuleType("presidio_analyzer")
    mod_a.AnalyzerEngine = FakeAnalyzer
    mod_b = types.ModuleType("presidio_anonymizer")
    mod_b.AnonymizerEngine = FakeAnonymizer
    mod_c = types.ModuleType("presidio_anonymizer.entities")
    mod_c.OperatorConfig = FakeOperatorConfig
    mod_b.entities = mod_c
    monkeypatch.setitem(sys.modules, "presidio_analyzer", mod_a)
    monkeypatch.setitem(sys.modules, "presidio_anonymizer", mod_b)
    monkeypatch.setitem(sys.modules, "presidio_anonymizer.entities", mod_c)
    monkeypatch.setattr(udfs, "_PRESIDIO", None)
    monkeypatch.setattr(udfs, "_PRESIDIO_TRIED", False)

    for i in range(25):
        out = udfs.anonymize_text(f"row {i} mail a@b.com")
        assert "xxx@xxx.xx" in out
    assert counts == {"analyzer": 1, "anonymizer": 1}


def test_regex_tier_without_presidio():
    # container has no presidio: the regex tier must redact both patterns
    out = udfs.anonymize_text("mail a.b@example.co.uk call 07911 123 456 end")
    assert out == "mail xxx@xxx.xx call xx-xxxx-xxxx end"
