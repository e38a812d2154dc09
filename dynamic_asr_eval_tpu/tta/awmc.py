"""AWMC: anchor-leader EMA test-time adaptation.

Capability parity with the reference ``AWMC`` engine (``lcasr/lib.py:206-376``,
method of IEEE 10389640 cited at ``lcasr/lib.py:1769``):

per chunk, for each (inner) epoch:
  1. epoch 0 only: pseudo-labels from the *anchor* model (EMA decay 1.0 — the
     original weights, ``lcasr/lib.py:248``);
  2. pseudo-labels from the *leader* EMA model (decay ``ema_decay``, default
     0.999, ``:245``);
  3. student forward on the augmented chunk; summed CTC loss against both
     label banks, normalized by ``frames × batch × 2`` (``:322-330``);
  4. optimizer step, then leader-EMA update (``:335-337``);
  after the last epoch, a clean no-grad forward with the adapted weights is
  stitched (``:339-349``).

TPU redesign: one ``lax.scan`` over chunks carrying
``(params, opt_state, leader_ema, key)``; anchor params ride as a closure
constant; pseudo-label decoding is on-device (no host round trips); stitching
is the shared scatter-add accumulator.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dynamic_asr_eval_tpu.augment import apply_augmentation_pipeline
from dynamic_asr_eval_tpu.config import TTAConfig
from dynamic_asr_eval_tpu.ops.chunk import chunk_spectrogram
from dynamic_asr_eval_tpu.ops.ctc import ctc_loss, greedy_labels
from dynamic_asr_eval_tpu.optim.madgrad import madgrad
from dynamic_asr_eval_tpu.tta.runner import EngineOutput, _ds_ceil


class AWMCEngine:
    def __init__(
        self,
        model,
        blank_id: int,
        subsampling_factor: int,
        config: TTAConfig,
        optimizer: Optional[optax.GradientTransformation] = None,
        max_label_frames_ratio: float = 0.25,
    ):
        self.model = model
        self.blank_id = blank_id
        self.ds = subsampling_factor
        self.config = config
        if optimizer is None:
            opt_args = dict(config.optim_args)
            lr = opt_args.pop("lr", 9e-5)
            optimizer = madgrad(learning_rate=lr, **opt_args)
        self.optimizer = optimizer
        self._cache: Dict = {}

    def _forward(self, params, extra_vars, batch, lengths):
        return self.model.apply({"params": params, **extra_vars}, batch, length=lengths)

    def _chunk_step(self, extra_vars, anchor_params, max_tokens, epochs, carry, xs):
        params, opt_state, leader, key = carry
        window, w_len = xs
        ema_d = self.config.ema_decay
        V = self.blank_id + 1
        T_ds_static = _ds_ceil(window.shape[-1], self.ds)

        def decode_with(p, w, l):
            out = self._forward(p, extra_vars, w[None], jnp.full((1,), l, jnp.int32))
            lp = out["final_posteriors"][0]
            ds_len = out["length"][0]
            labels, lab_len = greedy_labels(lp, ds_len, self.blank_id, max_tokens)
            return labels, lab_len, ds_len

        def do_chunk(params, opt_state, leader, key):
            # anchor labels once per chunk (epoch 0; lcasr/lib.py:284-291)
            anchor_labels, anchor_len, _ = decode_with(anchor_params, window, w_len)

            def epoch_body(j, state):
                params, opt_state, leader, key = state
                key, k_aug = jax.random.split(key)
                leader_labels, leader_len, _ = decode_with(leader, window, w_len)

                aug = apply_augmentation_pipeline(
                    window[None], k_aug,
                    self.config.spec_augment, self.config.frame_shuffle,
                    self.config.cutout, self.config.random_noise,
                    actual_len=w_len,
                )

                labels2 = jnp.stack([anchor_labels, leader_labels])
                lens2 = jnp.stack([anchor_len, leader_len])

                def loss_fn(p):
                    out = self._forward(p, extra_vars, aug, jnp.full((1,), w_len, jnp.int32))
                    lp = out["final_posteriors"]  # [1, T_ds, V]
                    ds_len = out["length"][0]
                    T_ds = lp.shape[1]
                    # student logits repeated against both label banks
                    loss = ctc_loss(
                        jnp.repeat(lp, 2, axis=0),
                        jnp.full((2,), ds_len, jnp.int32),
                        labels2,
                        lens2,
                        blank_id=self.blank_id,
                    ) / (T_ds * 1 * 2)
                    return loss

                grads = jax.grad(loss_fn)(params)
                updates, opt_state = self.optimizer.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                leader = jax.tree.map(
                    lambda e, p: ema_d * e + (1.0 - ema_d) * p, leader, params
                )
                return (params, opt_state, leader, key)

            params, opt_state, leader, key = jax.lax.fori_loop(
                0, epochs, epoch_body, (params, opt_state, leader, key)
            )
            # clean pass with adapted weights for stitching (lcasr/lib.py:339-344)
            out = self._forward(
                params, extra_vars, window[None], jnp.full((1,), w_len, jnp.int32)
            )
            return params, opt_state, leader, key, out["final_posteriors"][0], out["length"][0]

        def skip(params, opt_state, leader, key):
            return (
                params, opt_state, leader, key,
                jnp.zeros((T_ds_static, V), jnp.float32),
                jnp.asarray(0, jnp.int32),
            )

        params, opt_state, leader, key, clean_lp, ds_len = jax.lax.cond(
            w_len > 0, do_chunk, skip, params, opt_state, leader, key
        )
        return (params, opt_state, leader, key), (clean_lp, ds_len)

    def __call__(
        self,
        variables: Dict[str, Any],
        spec: np.ndarray,
        seq_len: int = -1,
        overlap: int = -1,
        return_params: bool = False,
        rng: Optional[jax.Array] = None,
    ) -> EngineOutput:
        cfg = self.config
        seq_len = cfg.seq_len if seq_len == -1 else seq_len
        overlap = cfg.overlap if overlap == -1 else overlap
        spec = np.asarray(spec)
        if spec.ndim == 3:
            spec = spec[0]
        spec_n = spec.shape[-1]
        if seq_len > spec_n:
            seq_len, overlap = spec_n, 0

        windows_np, lengths_np, starts_np, n_real = chunk_spectrogram(spec, seq_len, overlap)
        N, F, W = windows_np.shape
        total_ds = _ds_ceil(spec_n, self.ds) + _ds_ceil(W, self.ds)

        params = variables["params"]
        extra_vars = {k: v for k, v in variables.items() if k != "params"}
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        epochs = max(cfg.epochs, 1)

        key = (W, N, total_ds, epochs)
        if key not in self._cache:
            max_tokens = max(8, int(_ds_ceil(W, self.ds) * 0.25))

            def run(params, opt_state, extra_vars, windows, lengths, starts_ds, rng):
                step = partial(self._chunk_step, extra_vars, params, max_tokens, epochs)
                # NOTE: anchor = starting params of this call (decay-1.0 EMA)
                leader = params
                (adapted, opt_state, leader, _), (clean_lps, ds_lens) = jax.lax.scan(
                    step, (params, opt_state, leader, rng), (windows, lengths)
                )
                from dynamic_asr_eval_tpu.ops.stitch import stitch_chunk_probs

                log_avg, counts = stitch_chunk_probs(
                    jnp.exp(clean_lps), ds_lens, starts_ds, total_ds
                )
                return adapted, log_avg, counts

            self._cache[key] = jax.jit(run)

        t0 = time.time()
        opt_state = self.optimizer.init(params)
        adapted, log_avg, counts = self._cache[key](
            params, opt_state, extra_vars,
            jnp.asarray(windows_np), jnp.asarray(lengths_np),
            jnp.asarray(starts_np // self.ds), rng,
        )
        counts = np.asarray(counts)
        stitched = np.asarray(log_avg)[counts > 0]
        elapsed = time.time() - t0
        if cfg.print_runtimes:
            print(f"Spectrogram length: {spec_n}")
            print(f"Runtime: {elapsed}")
        return EngineOutput(
            logits=stitched.astype(np.float32),
            params=adapted if return_params else None,
            elapsed=elapsed,
        )
