"""Long-sequence stability soak (slow tier; see scripts/soak.py).

The default suite exercises <=40-frame runs; this drives 300 frames at
15-person density through the pipelined engine on the CPU mesh and
asserts flat memory, stable fps and bounded vis-id recycling — the
reference's own protocol runs 795 frames (parameters.txt:10-26).

Run explicitly:  python -m pytest tests/test_soak.py -m slow -q
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

pytestmark = pytest.mark.slow


def test_long_sequence_stability():
    from soak import run_soak

    out = run_soak(num_frames=300, num_people=15, verbose=False)
    assert out["checks"]["fps_stable"], out
    assert out["checks"]["registry_flat"], out
    assert out["checks"]["buffers_flat"], out
    assert out["checks"]["vis_ids_bounded"], out
