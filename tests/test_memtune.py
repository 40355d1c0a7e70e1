"""Allocator-tuning opt-in gate parse (ADVICE r3): only explicit truthy
values enable tuning — TNG_MALLOC_TUNE=0 must disable, not enable."""

import tesserae_ng_spark.memtune as memtune


def test_env_opt_in_parse(monkeypatch):
    for v, want in [
        ("1", True), ("true", True), ("YES", True), ("on", True),
        ("0", False), ("false", False), ("off", False), ("", False),
        ("2", False), ("enabled", False), (" 1 ", True),
    ]:
        monkeypatch.setenv("TNG_MALLOC_TUNE", v)
        assert memtune.env_opt_in() is want, (v, want)
    monkeypatch.delenv("TNG_MALLOC_TUNE")
    assert memtune.env_opt_in() is False


def test_tune_respects_disabled_env(monkeypatch):
    """A non-truthy TNG_MALLOC_TUNE must not tune (force=False path) even
    though the variable is set."""
    monkeypatch.setenv("TNG_MALLOC_TUNE", "0")
    monkeypatch.setattr(memtune, "_done", False)
    assert memtune.tune_allocator() is False
