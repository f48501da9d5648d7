"""Partition-logic parity tests (reference prepare_dataset.py:190-259)."""

import os

from omr_a2s_multimodal_transformer_tpu.data.prepare_dataset import (
    create_grandstaff_partitions,
    extract_org_name,
    split_samples,
)


def test_extract_org_name():
    cases = {
        "keyboard-sonatas_L337K336_maj2_down_m-73-76": "keyboard-sonatas_L337K336_m-73-76",
        "keyboard-sonatas_L340K476_original_m-51-56": "keyboard-sonatas_L340K476_m-51-56",
        "piano-sonatas_sonata01-1_min3_down_m-49-53": "piano-sonatas_sonata01-1_m-49-53",
        "piano-sonatas_sonata16-1_original_m-121-126": "piano-sonatas_sonata16-1_m-121-126",
    }
    for raw, expect in cases.items():
        assert extract_org_name(raw) == expect


def test_split_excludes_transpositions_of_test_pieces():
    samples = [
        "x_p1_original_m-1-4",   # -> test
        "x_p1_maj2_up_m-1-4",    # transposition of a test piece -> excluded
        "x_p2_min3_down_m-5-8",  # train/val (p2 has no original)
        "x_p3_maj2_down_m-1-2",
        "x_p4_min2_up_m-3-6",
        "x_p5_maj3_up_m-2-4",
        "x_p6_min6_down_m-9-12",
    ]
    train, val, test = split_samples(samples)
    assert test == ["x_p1_original_m-1-4"]
    assert "x_p1_maj2_up_m-1-4" not in train + val + test
    assert sorted(train + val) == sorted(samples[2:])
    assert len(val) == 1  # 20% of 5 -> 1


def test_split_deterministic_seed42():
    samples = [f"x_p{i}_maj2_up_m-1-4" for i in range(10)]
    t1 = split_samples(samples)
    t2 = split_samples(samples)
    assert t1 == t2


def test_global_partition_concat(tmp_path):
    root = str(tmp_path)
    for composer, pieces in [("mozart", ["a", "b"]), ("chopin", ["c"])]:
        d = os.path.join(root, "partitions", composer)
        os.makedirs(d)
        for split in ("train", "val", "test"):
            with open(os.path.join(d, f"{split}.txt"), "w") as f:
                f.write("\n".join(f"{p}_{split}" for p in pieces))
    create_grandstaff_partitions(root)
    with open(os.path.join(root, "partitions", "grandstaff", "train.txt")) as f:
        lines = f.read().splitlines()
    assert "mozart\ta_train" in lines and "chopin\tc_train" in lines


# --------------------------------------------------------- audio synthesis
# The real deps (music21/fluidsynth) aren't installed here; mocks exercise
# the full control flow of synthesize_audio (reference
# prepare_dataset.py:100-162): success -> MIDI written, WAV synthesized,
# MIDI removed; parse failure -> error logged per composer + ALL sibling
# modality files deleted.

import sys
import types


def _mock_synthesis_modules(monkeypatch, fail_pieces):
    """Install fake music21/midi2audio modules; parse raises for krn files
    whose name contains any of fail_pieces."""
    calls = {"wav": [], "midi_removed": []}

    class Stream:
        def __init__(self, path):
            self.path = path

        def write(self, fmt, fp):
            assert fmt == "midi"
            with open(fp, "w") as f:
                f.write("MIDI")

    def parse(path):
        if any(p in os.path.basename(path) for p in fail_pieces):
            raise ValueError(f"cannot parse {os.path.basename(path)}")
        return Stream(path)

    m21 = types.ModuleType("music21")
    m21.converter = types.SimpleNamespace(parse=parse)
    monkeypatch.setitem(sys.modules, "music21", m21)

    class FluidSynth:
        def __init__(self, sample_rate, sound_font):
            self.sample_rate = sample_rate

        def midi_to_audio(self, midi_path, wav_path):
            assert os.path.exists(midi_path), "MIDI must exist when synthesizing"
            with open(wav_path, "wb") as f:
                f.write(b"RIFF")
            calls["wav"].append(wav_path)

    m2a = types.ModuleType("midi2audio")
    m2a.FluidSynth = FluidSynth
    monkeypatch.setitem(sys.modules, "midi2audio", m2a)
    return calls


def _make_corpus(root, composer, pieces):
    for sub in ("krn", "bekrn", "img", "img_distorted", "wav"):
        os.makedirs(os.path.join(root, composer, sub), exist_ok=True)
    for p in pieces:
        base = os.path.join(root, composer)
        with open(os.path.join(base, "krn", p + ".krn"), "w") as f:
            f.write("**kern\n4c\n*-\n")
        with open(os.path.join(base, "bekrn", p + ".bekrn"), "w") as f:
            f.write("**bekern\n4c\n*-\n")
        for sub, suffix in (("img", ".jpg"), ("img_distorted", "_distorted.jpg")):
            with open(os.path.join(base, sub, p + suffix), "wb") as f:
                f.write(b"\xff\xd8")


def test_synthesize_audio_success_and_error_paths(tmp_path, monkeypatch):
    from omr_a2s_multimodal_transformer_tpu.data.prepare_dataset import synthesize_audio

    root = str(tmp_path)
    _make_corpus(root, "mozart", ["good_original_m-1-4", "bad_original_m-5-8"])
    calls = _mock_synthesis_modules(monkeypatch, fail_pieces=["bad_"])

    # engine pinned: 'auto' additionally probes for the fluidsynth BINARY
    # and SoundFont (not mockable via module injection) and would fall back
    # to the native engine in this container
    errors = synthesize_audio(root=root, engine="fluidsynth")

    base = os.path.join(root, "mozart")
    # success path: WAV created, temp MIDI removed
    assert os.path.exists(os.path.join(base, "wav", "good_original_m-1-4.wav"))
    assert not os.path.exists(os.path.join(base, "krn", "good_original_m-1-4.krn.mid"))
    assert len(calls["wav"]) == 1
    # error path: per-composer log written, all sibling files deleted
    assert "mozart" in errors and len(errors["mozart"]) == 1
    log = os.path.join(root, "errors", "mozart.txt")
    assert os.path.exists(log)
    with open(log) as f:
        assert "bad_original_m-5-8.krn" in f.read()
    for sub, suffix in (("krn", ".krn"), ("bekrn", ".bekrn"),
                        ("img", ".jpg"), ("img_distorted", "_distorted.jpg")):
        assert not os.path.exists(os.path.join(base, sub, "bad_original_m-5-8" + suffix)), sub
    # the good sample's files are untouched
    assert os.path.exists(os.path.join(base, "krn", "good_original_m-1-4.krn"))


def test_synthesize_audio_no_errors_no_log(tmp_path, monkeypatch):
    from omr_a2s_multimodal_transformer_tpu.data.prepare_dataset import synthesize_audio

    root = str(tmp_path)
    _make_corpus(root, "chopin", ["ok_original_m-1-2"])
    _mock_synthesis_modules(monkeypatch, fail_pieces=[])
    errors = synthesize_audio(root=root, engine="fluidsynth")
    assert errors == {}
    assert not os.path.exists(os.path.join(root, "errors", "chopin.txt"))


def test_synthesize_audio_auto_probes_binary(tmp_path, monkeypatch):
    """engine='auto' must not pick fluidsynth on importability alone: with
    the python modules present but no fluidsynth binary/SoundFont, it falls
    back to the native engine instead of crashing mid-corpus."""
    from omr_a2s_multimodal_transformer_tpu.data.prepare_dataset import synthesize_audio

    root = str(tmp_path)
    _make_corpus(root, "haydn", ["ok_original_m-1-2"])
    calls = _mock_synthesis_modules(monkeypatch, fail_pieces=[])
    import shutil as _shutil

    monkeypatch.setattr(_shutil, "which", lambda name: None)
    errors = synthesize_audio(root=root)  # auto
    assert errors == {}
    # native engine produced the WAV; the mocked fluidsynth was never called
    assert os.path.exists(os.path.join(root, "haydn", "wav", "ok_original_m-1-2.wav"))
    assert calls["wav"] == []
