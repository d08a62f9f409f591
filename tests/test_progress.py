"""Progress bar + memory tracking (Debug.h:115-211, Util.cpp:640-653)."""
import io

import pytest

pytestmark = pytest.mark.smoke

from plass_tpu.utils.progress import (MemoryTracker, Progress, _item_string,
                                      current_rss, total_system_memory)


def test_bar_known_total():
    buf = io.StringIO()
    p = Progress(100, out=buf)
    for _ in range(100):
        p.update()
    out = buf.getvalue()
    assert out.startswith("[")
    assert out.count("=") == 65
    assert "] 100 " in out


def test_unknown_total_dots():
    buf = io.StringIO()
    p = Progress(None, out=buf)
    p.update(25000)
    p.finish()
    assert buf.getvalue().count("=") == 2  # one tick per 10K items


def test_vectorized_update_matches_scalar():
    a, b = io.StringIO(), io.StringIO()
    pa, pb = Progress(1000, out=a), Progress(1000, out=b)
    for _ in range(1000):
        pa.update()
    pb.update(730)
    pb.update(270)
    assert a.getvalue() == b.getvalue()


def test_item_string_suffixes():
    assert _item_string(999) == "999"
    assert _item_string(1234567) == "1.23M"
    assert _item_string(2_500_000_000) == "2.50B"


def test_memory_introspection():
    assert total_system_memory() > (1 << 30)
    assert current_rss() > 0


def test_memory_tracker_strict_raises():
    mt = MemoryTracker(limit=current_rss() + 1000, strict=True)
    with pytest.raises(MemoryError):
        mt.check(10 ** 9)


def test_memory_tracker_warns_once(caplog):
    mt = MemoryTracker(limit=current_rss() + 1000, strict=False)
    assert not mt.check(10 ** 9)
    assert not mt.check(10 ** 9)
    warnings = [r for r in caplog.records if r.levelname == "WARNING"]
    assert len(warnings) == 1
