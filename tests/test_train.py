
import pytest

pytestmark = pytest.mark.slow  # NST finetuning pipeline end-to-end
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dynamic_asr_eval_tpu.config import SpecAugmentConfig
from dynamic_asr_eval_tpu.models import ConformerConfig, init_conformer
from dynamic_asr_eval_tpu.train import (
    CosineSchedule,
    NSTTrainer,
    SequenceWarmupManager,
    SimpleDataset,
    TrainConfig,
    VariableBatchLoader,
)


CFG = ConformerConfig(
    feat_in=16, n_layers=1, d_model=32, n_heads=2, head_dim=16,
    vocab_size=28, subsampling_factor=4, subsampling_conv_channels=8,
    conv_kernel_size=5, compute_dtype=jnp.float32,
)


def make_records(n=4):
    return [
        {"id": f"rec{i}", "duration": 2.0 + i,
         "spec": np.random.default_rng(i).standard_normal((16, 80 + 40 * i)).astype(np.float32),
         "text": "hello world"}
        for i in range(n)
    ]


def process_fn(rec):
    return rec["spec"]


class TestSchedules:
    def test_cosine_warmup_and_decay(self):
        s = CosineSchedule(1.0, warmup_steps=10, total_steps=100)
        assert s(0) == pytest.approx(0.1)
        assert s(9) == pytest.approx(1.0)
        assert s(10) == pytest.approx(1.0, abs=1e-3)
        assert s(110) == pytest.approx(0.0, abs=1e-6)
        assert s(60) < s(20)

    def test_sequence_warmup_grows_and_shrinks_batch(self):
        m = SequenceWarmupManager(
            initial_seq_len=1024, max_seq_len=4096, increase_every_steps=2,
            growth_factor=2.0, initial_batch_size=8,
        )
        changed, L, B = m.step(2)
        assert changed and L == 2048 and B == 4
        changed, L, B = m.step(2)
        assert changed and L == 4096 and B == 2
        changed, L, B = m.step(10)
        assert not changed and L == 4096  # capped
        assert m.rotary_interpolation_factor == pytest.approx(2.0)

    def test_warmup_state_roundtrip(self):
        m = SequenceWarmupManager(initial_seq_len=512, increase_every_steps=3)
        m.step(4)
        m2 = SequenceWarmupManager.from_state_dict(m.state_dict())
        assert m2.current_seq_len == m.current_seq_len
        assert m2.steps_taken == m.steps_taken


class TestData:
    def test_duration_sorted_subgroup_shuffle(self):
        recs = make_records(8)
        ds = SimpleDataset(recs, duration_fn=lambda r: r["duration"], subgroup_size=2)
        order = ds.epoch_order(0)
        durs = [recs[i]["duration"] for i in order]
        # sorted up to within-pair swaps
        for i in range(0, len(durs) - 2, 2):
            assert max(durs[i:i+2]) <= min(durs[i+2:i+4])

    def test_seen_ids_resume(self):
        recs = make_records(4)
        ds = SimpleDataset(recs, seen_ids={"rec0", "rec1"})
        order = ds.epoch_order(0)
        assert all(recs[i]["id"] not in ("rec0", "rec1") for i in order)
        ds.reset_seen_ids()
        assert len(ds.epoch_order(0)) == 4

    def test_loader_pads_and_batches(self):
        recs = make_records(4)
        ds = SimpleDataset(recs)
        loader = VariableBatchLoader(ds, 2, process_fn)
        batches = list(loader)
        assert len(batches) == 2
        b = batches[0]
        assert b["spectrograms"].ndim == 3
        assert (b["lengths"] <= b["spectrograms"].shape[2]).all()
        # all records marked seen after the epoch
        assert len(ds.seen_ids) == 4


class TestNSTTrainer:
    def test_short_training_run_and_checkpoint_resume(self, tmp_path):
        model, variables = init_conformer(CFG, jax.random.PRNGKey(0), example_T=64)
        cfg = TrainConfig(
            peak_lr=1e-4, seq_len=64, batch_size=2, max_epochs=1,
            checkpoint_dir=str(tmp_path), save_every_recordings=100,
            spec_augment=SpecAugmentConfig(n_freq_masks=1, freq_mask_param=2),
        )
        trainer = NSTTrainer(model, variables, CFG, cfg)
        recs = make_records(3)
        ds = SimpleDataset(recs)
        trainer.train(ds, process_fn)
        assert trainer.step_count > 0
        # params moved, ema trails
        d = max(jax.tree.leaves(jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()), variables["params"], trainer.params)))
        assert d > 0

        ckpt = os.path.join(str(tmp_path), "epoch_0.ckpt")
        assert os.path.exists(ckpt) and os.path.exists(ckpt + ".train_state.pkl")

        trainer2 = NSTTrainer(model, variables, CFG, cfg)
        trainer2.resume(ckpt, ds)
        assert trainer2.step_count == trainer.step_count
        same = all(
            np.allclose(a, b) for a, b in zip(
                jax.tree.leaves(trainer.params), jax.tree.leaves(trainer2.params))
        )
        assert same

    def test_nan_resilience(self):
        model, variables = init_conformer(CFG, jax.random.PRNGKey(0), example_T=64)
        cfg = TrainConfig(peak_lr=1e-4, seq_len=64, batch_size=1, nan_strikes=2)
        trainer = NSTTrainer(model, variables, CFG, cfg)
        bad = np.full((16, 80), np.nan, np.float32)
        with pytest.raises(RuntimeError, match="non-finite"):
            trainer.train_recording(bad, jax.random.PRNGKey(1))
            trainer.train_recording(bad, jax.random.PRNGKey(2))
            trainer.train_recording(bad, jax.random.PRNGKey(3))
