"""TextGrid parsing and speaker-overlap removal."""
import numpy as np
import pytest

from sarssl_tpu.data.textgrid import (parse_textgrid, non_overlapped_regions,
                                      speech_segments)

TG = '''File type = "ooTextFile"
Object class = "TextGrid"

xmin = 0
xmax = 10
tiers? <exists>
size = 2
item []:
    item [1]:
        class = "IntervalTier"
        name = "spk1"
        xmin = 0
        xmax = 10
        intervals: size = 3
        intervals [1]:
            xmin = 0
            xmax = 2
            text = "hello there"
        intervals [2]:
            xmin = 2
            xmax = 5
            text = ""
        intervals [3]:
            xmin = 5
            xmax = 8
            text = "more speech"
    item [2]:
        class = "IntervalTier"
        name = "spk2"
        xmin = 0
        xmax = 10
        intervals: size = 2
        intervals [1]:
            xmin = 1
            xmax = 3
            text = "interrupting"
        intervals [2]:
            xmin = 3
            xmax = 10
            text = ""
'''


def test_parse_tiers_and_segments(tmp_path):
    p = tmp_path / "a.TextGrid"
    p.write_text(TG)
    tiers = parse_textgrid(str(p))
    assert set(tiers) == {"spk1", "spk2"}
    segs = speech_segments(tiers)
    # three non-empty intervals total
    assert len(segs) == 3
    assert segs[0] == (0.0, 2.0, "spk1")


def test_non_overlapped_regions():
    tiers = parse_textgrid(TG)
    regions = non_overlapped_regions(tiers)
    # spk1: 0-2 and 5-8; spk2: 1-3. Overlap 1-2. Single-speaker: 0-1, 2-3, 5-8
    assert regions == [(0.0, 1.0), (2.0, 3.0), (5.0, 8.0)]
    # with a minimum duration filter
    assert non_overlapped_regions(tiers, min_dur=1.5) == [(5.0, 8.0)]
