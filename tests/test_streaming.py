"""DeltaTracker / extract_delta parity (contract: crates/core/src/streaming.rs)."""

from dsocr_tpu.core import DeltaTracker, extract_delta


def test_extract_delta_prefix():
    assert extract_delta("hello", "hello world") == " world"


def test_extract_delta_divergence():
    assert extract_delta("abcx", "abcdz") == "dz"


def test_extract_delta_multibyte():
    assert extract_delta("日本", "日本語です") == "語です"


def test_tracker_streams_deltas():
    t = DeltaTracker()
    assert t.advance("Hel") == "Hel"
    assert t.advance("Hello") == "lo"
    assert t.advance("Hello!") == "!"
    assert t.snapshot == "Hello!"


def test_tracker_suppresses_trailing_replacement():
    t = DeltaTracker()
    assert t.advance("ok�") == "ok"
    # partial char resolved next step
    assert t.advance("ok語x") == "語x"


def test_tracker_all_replacement_suppressed():
    t = DeltaTracker()
    t.advance("ab")
    assert t.advance("ab�") == ""
    assert t.snapshot == "ab"


def test_tracker_final_flush_allows_replacement():
    t = DeltaTracker()
    t.advance("ab")
    assert t.advance("ab�", is_final=True) == "�"
    assert t.snapshot == "ab�"


def test_tracker_empty_delta_updates_previous():
    t = DeltaTracker()
    t.advance("abc")
    assert t.advance("abc") == ""
    assert t.snapshot == "abc"


def test_tracker_reset():
    t = DeltaTracker()
    t.advance("abc")
    t.reset()
    assert t.advance("x") == "x"
