"""Deterministic validator: reference gates + heuristic behavior."""

from jarvis_ocr_service_spark.operators.validate import validate_series, validate_text


def test_min_chars_gate_exact_reference_semantics():
    # reference provider_manager.py:175-176 — <3 stripped chars
    for t in ("", "  ", "ab", " a b "[:3]):
        ok, conf, reason = validate_text(t)
        assert (ok, conf, reason) == (False, 0.0, "Text too short or empty")
    ok, _, _ = validate_text("abc")
    assert ok


def test_garbled_consonant_soup_rejected():
    ok, conf, reason = validate_text("xkcd qwrtz bcdfg hjklm npqrst vwxyz")
    assert not ok and conf == 0.0
    assert "Garbled" in reason


def test_readable_text_accepted():
    ok, conf, reason = validate_text(
        "The quick brown fox jumps over the lazy dog near the river bank."
    )
    assert ok and 0.0 < conf <= 1.0
    assert len(reason) <= 200


def test_navigation_link_farm_rejected():
    nav = "\n".join(f"Cat {k}" for k in range(20))
    ok, conf, reason = validate_text(nav)
    assert not ok
    assert "Navigation-like" in reason


def test_low_alpha_density_rejected():
    ok, _, reason = validate_text("1234 5678 9012 3456 7890 ---- ====")
    assert not ok


def test_confidence_clamped():
    for t in ("abc", "Hello world this is fine text."):
        _, conf, _ = validate_text(t)
        assert 0.0 <= conf <= 1.0


def test_reason_capped_200():
    ok, _, reason = validate_text("word " * 500)
    assert len(reason) <= 200


def test_unicode_text_not_garbled():
    # non-ASCII words are excluded from the vowel heuristic
    ok, _, _ = validate_text("héllo wörld ünd schön güt mañana séjour déjà vu")
    assert ok


def test_series_matches_scalar():
    texts = ["", "ab", "hello world this is text", "xkcd qwrtz bcdfg hjklm"]
    import pandas as pd

    df = validate_series(pd.Series(texts))
    for t, (_, row) in zip(texts, df.iterrows()):
        ok, conf, reason = validate_text(t)
        assert (row.is_valid, row.confidence, row.reason) == (ok, conf, reason)
