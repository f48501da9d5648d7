"""MV2H glue coverage with stubbed music21/pyMV2H (the real deps are not
installed here — VERDICT r1 missing #3). Exercises compute_mv2h_metrics
end-to-end: seq2kern -> krn2midi quirks (*^/*v stripping) -> midi2txt
`.0`-stripping -> polyphonic scoring, the per-voice monophonic fallback,
and the contributes-0 exception path (reference metrics.py:94-338)."""

import sys
import types

import numpy as np
import pytest

FIELDS = ("multi_pitch", "voice", "meter", "harmony", "note_value")


class _FakeScore:
    """music21 parse() result: .write('midi') -> a real temp file."""

    def __init__(self, src_path):
        self.src_path = src_path

    def write(self, fmt):
        assert fmt == "midi"
        out = self.src_path + ".m21out"
        with open(out, "w") as f:
            f.write("MIDI")
        return out


def _install_stubs(monkeypatch, parse_fail=None, seen=None):
    """Install importable music21/pyMV2H stubs.

    parse_fail(path) -> bool: raise on those paths (simulates unparseable
    polyphonic kern). seen: dict collecting observed txt contents.
    """

    def parse(path):
        if parse_fail is not None and parse_fail(path):
            raise ValueError(f"cannot parse {path}")
        return _FakeScore(path)

    m21 = types.ModuleType("music21")
    m21_conv = types.ModuleType("music21.converter")
    m21_conv.parse = parse
    m21.converter = m21_conv

    class MidiConverter:
        def __init__(self, file, output):
            self.file, self.output = file, output

        def convert_file(self):
            with open(self.output, "w") as f:
                f.write("60.0 1.0\n62.0 2.0\n")

    class MV2H:  # placeholder result type
        def __init__(self, **kw):
            for k in FIELDS:
                setattr(self, k, kw.get(k, 0.0))

    class Music:
        def __init__(self, txt):
            self.txt = txt

        @classmethod
        def from_file(cls, path):
            with open(path) as f:
                content = f.read()
            if seen is not None:
                seen.setdefault("txt", []).append(content)
            return cls(content)

    def mv2h_fn(m1, m2):
        return MV2H(multi_pitch=1.0, voice=0.8, meter=0.6, harmony=0.4, note_value=0.2)

    py = types.ModuleType("pyMV2H")
    py_conv = types.ModuleType("pyMV2H.converter")
    py_conv_mc = types.ModuleType("pyMV2H.converter.midi_converter")
    py_conv_mc.MidiConverter = MidiConverter
    py_metrics = types.ModuleType("pyMV2H.metrics")
    py_metrics_mv2h = types.ModuleType("pyMV2H.metrics.mv2h")
    py_metrics_mv2h.mv2h = mv2h_fn
    py_utils = types.ModuleType("pyMV2H.utils")
    py_utils_music = types.ModuleType("pyMV2H.utils.music")
    py_utils_music.Music = Music
    py_utils_mv2h = types.ModuleType("pyMV2H.utils.mv2h")
    py_utils_mv2h.MV2H = MV2H

    mods = {
        "music21": m21, "music21.converter": m21_conv,
        "pyMV2H": py, "pyMV2H.converter": py_conv,
        "pyMV2H.converter.midi_converter": py_conv_mc,
        "pyMV2H.metrics": py_metrics, "pyMV2H.metrics.mv2h": py_metrics_mv2h,
        "pyMV2H.utils": py_utils, "pyMV2H.utils.music": py_utils_music,
        "pyMV2H.utils.mv2h": py_utils_mv2h,
    }
    for name, mod in mods.items():
        monkeypatch.setitem(sys.modules, name, mod)


SEQ = ["*clef", "*clef", "<cor>", "4c", "4d", "<cor>", "4e", "<con>", "4g", "<cor>"]


def test_polyphonic_path(monkeypatch):
    seen = {}
    _install_stubs(monkeypatch, seen=seen)
    from omr_a2s_multimodal_transformer_tpu.utils.mv2h import compute_mv2h_metrics

    out = compute_mv2h_metrics([SEQ], [SEQ])
    # stub returns fixed scores; keys renamed like the reference output
    assert out["multi-pitch"] == pytest.approx(1.0)
    assert out["voice"] == pytest.approx(0.8)
    assert out["mv2h"] == pytest.approx((1.0 + 0.8 + 0.6 + 0.4 + 0.2) / 5)
    # midi2txt stripped the `.0`s before Music.from_file consumed the txt
    assert seen["txt"] and all(".0" not in t for t in seen["txt"])
    assert "60 1\n62 2\n" in seen["txt"][0]


def test_monophonic_fallback(monkeypatch):
    calls = {"n": 0}

    def fail_polyphonic_pred(path):
        # fail only the first parse of the full pred file (the polyphonic
        # check); per-voice files then parse fine
        if path.endswith("pred.krn"):
            calls["n"] += 1
            return calls["n"] == 1
        return False

    _install_stubs(monkeypatch, parse_fail=fail_polyphonic_pred)
    from omr_a2s_multimodal_transformer_tpu.utils.mv2h import compute_mv2h_metrics

    out = compute_mv2h_metrics([SEQ], [SEQ])
    # 2-voice kern: both voices score the stub values -> averages unchanged
    assert out["multi-pitch"] == pytest.approx(1.0)
    assert out["mv2h"] == pytest.approx(0.6)


def test_unparseable_sample_contributes_zero(monkeypatch):
    _install_stubs(monkeypatch, parse_fail=lambda p: True)
    from omr_a2s_multimodal_transformer_tpu.utils.mv2h import compute_mv2h_metrics

    out = compute_mv2h_metrics([SEQ, SEQ], [SEQ, SEQ])
    assert all(np.isfinite(v) and v == 0.0 for v in out.values()), out


def test_missing_deps_error_is_actionable(monkeypatch):
    for name in list(sys.modules):
        if name.startswith(("music21", "pyMV2H")):
            monkeypatch.delitem(sys.modules, name)
    monkeypatch.setitem(sys.modules, "music21", None)  # force ImportError
    from omr_a2s_multimodal_transformer_tpu.utils.mv2h import compute_mv2h_metrics

    with pytest.raises(ImportError, match="music21"):
        compute_mv2h_metrics([SEQ], [SEQ])
