"""Config rules: grids, trial counts, task durations, directory scheme."""
import pytest

from sarssl_tpu.config import (AcousticSetting, DownstreamConfig,
                               PretrainConfig, SIM_LR_SET, SIM_ROOM_TRIALS,
                               exp_dirs)
from sarssl_tpu.train.schedules import exp_decay, linear_schedule


def test_acoustic_setting():
    ac = AcousticSetting()
    assert ac.nsample == 65792  # 4.112 s @ 16 kHz -> 256 frames
    assert ac.mic_dist_range == (0.03, 0.20)


def test_downstream_trial_rule():
    # ntrial = max(1, round(32/nsimroom)) (reference opt.py:205-206)
    assert DownstreamConfig(nsimroom=2).ntrial == 16
    assert DownstreamConfig(nsimroom=8).ntrial == 4
    assert DownstreamConfig(nsimroom=256).ntrial == 1
    assert DownstreamConfig(nsimroom=8).train_num == 800


def test_task_duration_rule():
    # TDOA uses 1.04 s clips, others 4.112 s (reference run_downstream.py:71-74)
    assert DownstreamConfig(task="TDOA").T == 1.04
    assert DownstreamConfig(task="T60").T == 4.112


def test_sim_grids():
    assert tuple(SIM_LR_SET) == (1e-3, 5e-4, 1e-4, 5e-5)
    assert SIM_ROOM_TRIALS[2] == 16 and SIM_ROOM_TRIALS[32] == 1


def test_exp_dirs_layout():
    d = exp_dirs("root", time_ver="t1")
    assert d["ckpt_pretrain"].endswith("pretrain/checkpoints")
    assert "t1" in d["base"]


def test_exp_decay_schedule():
    fn = exp_decay(lr_init=1e-3, step_size=10, gamma=0.5)
    assert fn(0) == pytest.approx(1e-3)
    assert fn(10) == pytest.approx(5e-4)


def test_linear_schedule_endpoints():
    fn = linear_schedule(10, base=1e-3, linear_end=1e-5)
    assert fn(0) == pytest.approx(1e-3)
    assert fn(10) == pytest.approx(1e-5)
