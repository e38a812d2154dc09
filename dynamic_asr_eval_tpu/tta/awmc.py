"""AWMC: anchor-leader EMA test-time adaptation.

Capability parity with the reference ``AWMC`` engine (``lcasr/lib.py:206-376``,
method of IEEE 10389640 cited at ``lcasr/lib.py:1769``):

per chunk, for each (inner) epoch:
  1. epoch 0 only: pseudo-labels from the *anchor* model (EMA decay 1.0 — the
     original weights, ``lcasr/lib.py:248``);
  2. pseudo-labels from the *leader* EMA model (decay ``ema_decay``, default
     0.999, ``:245``; the reference's EMA is ``torch_ema`` whose default
     ``use_num_updates=True`` caps the n-th update's decay at
     ``min(ema_decay, (1+n)/(10+n))`` — reproduced here, pinned against the
     reference source by ``tests/test_reference_source_loop_oracle.py``;
     ``TTAConfig.ema_use_num_updates=False`` restores flat decay);
  3. student forward on the augmented chunk; summed CTC loss against both
     label banks, normalized by ``frames × batch × 2`` (``:322-330``);
  4. optimizer step, then leader-EMA update (``:335-337``);
  after the last epoch, a clean no-grad forward with the adapted weights is
  stitched (``:339-349``).

TPU redesign: one ``lax.scan`` over chunks carrying
``(params, opt_state, leader_ema, key)``; anchor params ride as a closure
constant; the spectrogram is uploaded once and chunks are sliced on device;
pseudo-label decoding is on-device; stitching accumulates in the scan carry
and the stitched matrix stays on device.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dynamic_asr_eval_tpu.augment import apply_augmentation_pipeline
from dynamic_asr_eval_tpu.config import TTAConfig
from dynamic_asr_eval_tpu.ops.ctc import ctc_loss, greedy_labels
from dynamic_asr_eval_tpu.optim.madgrad import madgrad
from dynamic_asr_eval_tpu.tta.runner import DynamicEvalEngine, EngineOutput


class AWMCEngine(DynamicEvalEngine):
    """Shares the chunk-planning / caching machinery of DynamicEvalEngine but
    replaces the adaptation step with the anchor/leader scheme."""

    def _build_awmc(self, W: int, N: int, total_ds: int, epochs: int):
        T_ds_static = self.out_len_fn(W)
        max_tokens = max(8, int(T_ds_static * self.max_label_frames_ratio))
        V = self.n_classes
        ema_d = self.config.ema_decay
        # The reference's EMA is torch_ema.ExponentialMovingAverage
        # (lcasr/lib.py:26,245) whose DEFAULT use_num_updates=True caps the
        # effective decay at min(decay, (1+n)/(10+n)) for the n-th update —
        # far below 0.999 for the length of a typical TTA run (n≈#windows).
        # The leader's counter starts at 1: the construction-time .update()
        # (lcasr/lib.py:246) is a value no-op (shadow==params) but advances n.
        use_nu = self.config.ema_use_num_updates

        def decode_with(p, extra_vars, w, l):
            out = self._forward({"params": p, **extra_vars}, w[None], jnp.full((1,), l, jnp.int32))
            lp = out["final_posteriors"][0]
            ds_len = out["length"][0]
            labels, lab_len = greedy_labels(lp, ds_len, self.blank_id, max_tokens)
            return labels, lab_len, ds_len

        def chunk_step(extra_vars, anchor_params, spec_dev, carry, xs):
            params, opt_state, leader, n_upd, key, acc = carry
            start, w_len, start_ds = xs
            F = spec_dev.shape[0]
            window = jax.lax.dynamic_slice(spec_dev, (0, start), (F, W)).astype(jnp.float32)

            def do_chunk(params, opt_state, leader, n_upd, key):
                anchor_labels, anchor_len, _ = decode_with(anchor_params, extra_vars, window, w_len)

                def epoch_body(j, state):
                    params, opt_state, leader, n_upd, key = state
                    key, k_aug = jax.random.split(key)
                    leader_labels, leader_len, _ = decode_with(leader, extra_vars, window, w_len)
                    aug = apply_augmentation_pipeline(
                        window[None], k_aug,
                        self.config.spec_augment, self.config.frame_shuffle,
                        self.config.cutout, self.config.random_noise,
                        actual_len=w_len,
                    )
                    labels2 = jnp.stack([anchor_labels, leader_labels])
                    lens2 = jnp.stack([anchor_len, leader_len])

                    def loss_fn(p):
                        out = self._forward(
                            {"params": p, **extra_vars}, aug, jnp.full((1,), w_len, jnp.int32)
                        )
                        lp = out["final_posteriors"]
                        ds_len = out["length"][0]
                        # drop empty label banks like the reference
                        # (lcasr/lib.py: labels = [el for el in label_bank if
                        # el.shape[0] > 0]) — an empty bank would otherwise
                        # train the student toward all-blank collapse
                        bank_weights = (lens2 > 0).astype(jnp.float32)
                        loss = ctc_loss(
                            jnp.repeat(lp, 2, axis=0),
                            jnp.full((2,), ds_len, jnp.int32),
                            labels2,
                            lens2,
                            blank_id=self.blank_id,
                            sample_weights=bank_weights,
                        ) / (jnp.maximum(ds_len, 1) * 1 * 2)
                        return loss

                    grads = jax.grad(loss_fn)(params)
                    updates, opt_state = self.optimizer.update(grads, opt_state, params)
                    params = optax.apply_updates(params, updates)
                    n_upd = n_upd + 1.0
                    d_t = (
                        jnp.minimum(ema_d, (1.0 + n_upd) / (10.0 + n_upd))
                        if use_nu else jnp.float32(ema_d)
                    )
                    leader = jax.tree.map(
                        lambda e, p: d_t * e + (1.0 - d_t) * p, leader, params
                    )
                    return (params, opt_state, leader, n_upd, key)

                params2, opt_state2, leader2, n_upd2, key2 = jax.lax.fori_loop(
                    0, epochs, epoch_body, (params, opt_state, leader, n_upd, key)
                )
                out = self._forward(
                    {"params": params2, **extra_vars}, window[None],
                    jnp.full((1,), w_len, jnp.int32),
                )
                return params2, opt_state2, leader2, n_upd2, key2, out["final_posteriors"][0], out["length"][0]

            def skip(params, opt_state, leader, n_upd, key):
                return (
                    params, opt_state, leader, n_upd, key,
                    jnp.zeros((T_ds_static, V), jnp.float32),
                    jnp.asarray(0, jnp.int32),
                )

            params, opt_state, leader, n_upd, key, clean_lp, ds_len = jax.lax.cond(
                w_len > 0, do_chunk, skip, params, opt_state, leader, n_upd, key
            )

            acc_probs, acc_counts = acc
            fidx = jnp.arange(T_ds_static)
            m = fidx < ds_len
            pos = jnp.where(m, start_ds + fidx, total_ds)
            acc_probs = acc_probs.at[pos].add(jnp.exp(clean_lp) * m[:, None], mode="drop")
            acc_counts = acc_counts.at[pos].add(m.astype(jnp.float32), mode="drop")

            return (params, opt_state, leader, n_upd, key, (acc_probs, acc_counts)), None

        def run(params, extra_vars, spec_dev, starts, lengths, starts_ds, key):
            opt_state = self.optimizer.init(params)
            step = partial(chunk_step, extra_vars, params, spec_dev)
            leader = params  # leader EMA starts at the anchor
            n_upd0 = jnp.float32(1.0)  # construction-time update, lib.py:246
            acc0 = (
                jnp.zeros((total_ds + 1, V), jnp.float32),
                jnp.zeros((total_ds + 1,), jnp.float32),
            )
            (adapted, _, _, _, _, acc), _ = jax.lax.scan(
                step, (params, opt_state, leader, n_upd0, key, acc0),
                (starts, lengths, starts_ds),
            )
            log_avg = jnp.log(
                jnp.maximum(
                    acc[0][:total_ds] / jnp.maximum(acc[1][:total_ds, None], 1.0), 1e-12
                )
            )
            return adapted, log_avg, acc[1][:total_ds]

        return jax.jit(run)

    def __call__(
        self,
        variables: Dict[str, Any],
        spec: np.ndarray,
        seq_len: int = -1,
        overlap: int = -1,
        return_params: bool = False,
        rng: Optional[jax.Array] = None,
        **_,
    ) -> EngineOutput:
        cfg = self.config
        spec_padded, spec_n, W, N, n_real, starts_np, lengths_np, total_ds = self._plan(
            spec, seq_len, overlap
        )
        params = variables["params"]
        extra_vars = {k: v for k, v in variables.items() if k != "params"}
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        epochs = max(cfg.epochs, 1)

        key = (W, N, total_ds, epochs)
        if key not in self._adapt_cache:
            self._adapt_cache[key] = self._build_awmc(W, N, total_ds, epochs)

        t0 = time.time()
        spec_dev = jnp.asarray(spec_padded, self.transfer_dtype)
        adapted, log_avg, counts = self._adapt_cache[key](
            params, extra_vars, spec_dev,
            jnp.asarray(starts_np), jnp.asarray(lengths_np),
            jnp.asarray(starts_np // self.ds), rng,
        )
        log_avg.block_until_ready()
        elapsed = time.time() - t0
        if cfg.print_runtimes:
            print(f"Spectrogram length: {spec_n}")
            print(f"Runtime: {elapsed}")
        return EngineOutput(
            logits=log_avg,
            counts=counts,
            params=adapted if return_params else None,
            elapsed=elapsed,
            blank_id=self.blank_id,
        )
