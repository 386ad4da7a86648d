"""Measured forward parity vs the actual PyTorch reference.

Transplants flax weights into the reference ``SARSSL``
(/root/reference/code/model.py:350-601) and checks pretext loss /
reconstruction / downstream prediction agreement on an identical seeded
batch + mask. Uses the full embedding dims (spec 512x1, spat 256x3) on a
shortened nt so it stays CI-sized.
"""
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

torch = pytest.importorskip("torch")

REF = "/root/reference/code"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not mounted")


def test_forward_parity_vs_reference():
    from reference_parity import run_parity

    r = run_parity(nt=16, nb=2, seed=0)
    assert r["pretext_loss_absdiff"] <= 1e-3, r
    assert r["diff_absdiff"] <= 1e-3, r
    assert r["recon_mse_between_frameworks"] <= 1e-3, r
    assert r["downstream_pred_maxabs"] <= 1e-3, r
    assert r["pass"], r
