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
