"""Export a few tiny synthetic sample PNGs for the verify recipe's
transcribe step (.claude/skills/verify — `--inputs $W/imgs/*.png`)."""

import os
import sys

sys.path.insert(0, ".")

from omr_a2s_multimodal_transformer_tpu.data import sources  # noqa: E402


def main(out_dir: str = "/tmp/verify_ws/imgs") -> None:
    src = sources.SyntheticSource(n=4, seed=3, n_measures=1, encoding="kern",
                                  img_height_range=(32, 33), img_width_range=(64, 96))
    os.makedirs(out_dir, exist_ok=True)
    for i in range(4):
        src[i]["image"].save(os.path.join(out_dir, f"s{i}.png"))
    print(f"exported 4 PNGs -> {out_dir}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_ws/imgs")
