"""Generate golden fixtures for the kern tokenizer by running the REFERENCE
tokenizer (/root/reference/src/data/encoding.py) on a corpus of synthetic kern
texts that exercise every cleaning rule. The fixtures (input text -> token
list) are committed so tests don't depend on the reference being mounted.

Run manually: python tests/make_encoding_fixtures.py
"""

import importlib.util
import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "fixtures", "encoding_golden.json")
REF = "/root/reference/src/data/encoding.py"

SAMPLES = [
    # Simple two-voice kern with header, comments, meter, key, clefs, barlines.
    """!!!COM: Mozart
**kern\t**kern
*clefF4\t*clefG2
*k[f#]\t*k[f#]
*M4/4\t*M4/4
=1\t=1
4C 4E\t4cc
8D\t8dd 8ff
.\t8ee
=2\t=2
*-\t*-
""",
    # Clef change placeholder '*' in the other voice.
    """**kern\t**kern
*clefF4\t*clefG2
4C\t4c
*clefG2\t*
4D\t4d
*\t*clefF4
4E\t4e
""",
    # Grace notes, multirests, rests, ties, slurs.
    """**kern\t**kern
*clefF4\t*clefG2
rr12\t4r
8qcc\t16qqdd#
[4C\t4c]
sdd\t8f# 8a-
2.G\t2.gg##
=12||\t=12||
""",
    # Spine open/close.
    """**kern
*clefG2
4c
*^
4d\t4e
*v\t*v
4f
""",
    # Placeholder with no clef history (fallback to left neighbor).
    """**kern\t**kern
4C\t4c
*clefG2\t*
4D\t4d
""",
    # bekern-style dot separators.
    """**bekern
*clefG2
4·c·c
8·d #
=·1
""",
    # Tokens that fail to parse (voice dropped), weird durations.
    """**kern\t**kern
*clefF4\t*clefG2
zzz\t4c
32A-\t64.b--
128ccc#\t4C 8E 16G
!LO:N\t4d
""",
    # Placeholder on row 0 history edge; every row has the column.
    """*\t*clefG2
4C\t4c
*\t4d
""",
    # Single-voice with only barlines and DOT sync.
    """**kern
*clefG2
=1
.
4c
=2
""",
    # Chord with ties inside and multiple accidentals.
    """**kern
*clefF4
[4C [4E
4C] 4E]
2F## 2A-- 2cnn
""",
]


def main():
    spec = importlib.util.spec_from_file_location("ref_encoding", REF)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    fixtures = []
    for enc in ["kern", "bekern"]:
        parser = ref.krnParser(encoding=enc)
        for text in SAMPLES:
            try:
                tokens = parser.encode(text=text)
            except Exception as e:  # record failures too (we must match them)
                tokens = {"error": type(e).__name__}
            fixtures.append({"encoding": enc, "text": text, "tokens": tokens})

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(fixtures, f, indent=1)
    print(f"wrote {len(fixtures)} fixtures to {OUT}")


if __name__ == "__main__":
    main()
