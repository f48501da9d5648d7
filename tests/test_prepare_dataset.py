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
