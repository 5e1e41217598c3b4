"""Decode integration point: a present-but-failing codec lib must fall
back to the deterministic fake (regression: it used to raise
NotImplementedError whenever the import merely succeeded), and a
present-and-working codec lib must surface real dimensions."""

from __future__ import annotations

import hashlib
import sys
import types

import pandas as pd

from rdbms_metadata_manager_spark.llm.multimodal import (
    _decode_batches,
    _fake_features,
    _try_real_decode,
)


def _install_fake_pil(monkeypatch, open_impl):
    fake_image_mod = types.ModuleType("PIL.Image")
    fake_image_mod.open = open_impl
    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = fake_image_mod
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", fake_image_mod)


def test_present_but_failing_codec_falls_back_to_fake(monkeypatch):
    def _open(_buf):
        raise ValueError("not an image")

    _install_fake_pil(monkeypatch, _open)
    blob = b"not-really-a-png"
    assert _try_real_decode(blob, "image") is None
    pdf = pd.DataFrame({"doc_id": [1], "modality": ["image"], "blob": [blob]})
    (out,) = list(_decode_batches(iter([pdf])))
    assert len(out) == 1
    h, w, hgt = _fake_features(blob)
    row = out.iloc[0]
    assert (row["content_hash"], row["width"], row["height"]) == (h, w, hgt)


def test_working_codec_surfaces_real_dimensions(monkeypatch):
    class _Im:
        size = (320, 240)

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    _install_fake_pil(monkeypatch, lambda _buf: _Im())
    blob = b"pretend-decodable"
    got = _try_real_decode(blob, "image")
    assert got == (hashlib.md5(blob).hexdigest()[:8], 320, 240)


def test_audio_chunk_window_math_hand_computed():
    """Boundary-exact window math on a synthetic long blob: a blob of
    600 bytes = 38 400 fake samples yields ceil((38400-16000)/8000)+1
    = 4 windows, the last clamped to the sample count — and a short
    blob yields exactly one clamped window."""
    import pandas as pd

    from rdbms_metadata_manager_spark.llm.multimodal import (
        AUDIO_HOP,
        AUDIO_SR,
        AUDIO_WIN,
        _audio_batches,
    )

    long_blob, short_blob = b"x" * 600, b"y" * 10
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "blob": [long_blob, short_blob, b"z" * 100],
            "modality": ["audio", "audio", "video"],  # video row must be skipped
        }
    )
    out = pd.concat(list(_audio_batches(iter([pdf]))))
    long_rows = out[out.doc_id == 1]
    assert list(long_rows.chunk_idx) == [0, 1, 2, 3]
    n_samples = 600 * 64
    for j, row in zip(range(4), long_rows.itertuples()):
        start = j * AUDIO_HOP
        end = min(start + AUDIO_WIN, n_samples)
        assert (row.start_ms, row.end_ms) == (
            start * 1000 // AUDIO_SR,
            end * 1000 // AUDIO_SR,
        )
    # last window is the clamped one
    assert long_rows.iloc[-1].end_ms == n_samples * 1000 // AUDIO_SR
    short_rows = out[out.doc_id == 2]
    assert len(short_rows) == 1
    assert (short_rows.iloc[0].start_ms, short_rows.iloc[0].end_ms) == (
        0,
        10 * 64 * 1000 // AUDIO_SR,
    )
    assert 3 not in set(out.doc_id)
