"""Chunked dynamic-evaluation (NSTI) engine — the TPU-native core.

Re-designs the reference's ``dynamic_eval_ctc_loss`` (``lcasr/lib.py:450-640``)
as a fully on-device pipeline.  Reference semantics preserved:

- windows of ``seq_len`` frames with ``overlap``, reference stop rule
  (``prepare_chunks``, ``lcasr/lib.py:128-145``);
- each step forwards ``[augmented × num_negatives, clean]`` as one batch,
  greedy-decodes the *clean* stream into pseudo-labels, and takes one CTC
  step on the *augmented* stream (``lcasr/lib.py:539-581``), loss summed and
  divided by ``frames × num_negatives`` (``:573-575``);
- ``online`` mode stitches the clean output of the adaptation pass itself
  (epochs=1, no shuffle, no final pass; ``:583-590,594``); offline mode does
  a fresh no-grad pass with the adapted weights (``:596-612``);
- stitching = overlap probability averaging then log (``:615-629``);
- parameter restore-invariance is free: parameters are immutable pytrees, the
  engine returns adapted params separately (`return_params`,
  ``lcasr/lib.py:631-637``).

TPU-first differences (the point of the rebuild — BASELINE.json north star:
"per-recording SGD updates without host round-trips"):

- pseudo-label greedy decode happens on device (``ops.ctc.greedy_labels``) —
  the reference ships logits to CPU every chunk (``lcasr/lib.py:559``);
- the whole per-recording adaptation is ONE jitted ``lax.scan`` over windows
  (no per-chunk dispatch, no host sync);
- window count is bucket-padded (powers of two) so recompiles are bounded;
  padded windows are skipped with ``lax.cond``;
- inference stitches via a scatter-add accumulator carried through the scan.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dynamic_asr_eval_tpu.augment import apply_augmentation_pipeline
from dynamic_asr_eval_tpu.config import TTAConfig
from dynamic_asr_eval_tpu.ops.chunk import chunk_spectrogram
from dynamic_asr_eval_tpu.ops.ctc import ctc_loss, greedy_labels
from dynamic_asr_eval_tpu.optim.madgrad import madgrad
from dynamic_asr_eval_tpu.optim.masks import masked_optimizer, param_labels


class EngineOutput(NamedTuple):
    logits: np.ndarray  # stitched [T_total_ds, V] log-probs
    params: Optional[Any]  # adapted params (None unless return_params)
    elapsed: float


def _ds_ceil(x, factor):
    return -(-x // factor)


class DynamicEvalEngine:
    """NSTI dynamic evaluation for a conformer-CTC model.

    Parameters
    ----------
    model : flax module with the reference call surface
        ``apply(variables, audio [B,F,T], length) -> {'final_posteriors',
        'length'}``.
    blank_id : CTC blank (``vocab_size`` by reference convention).
    config : TTAConfig (epochs, online, shuffle, augmentations, optimizer lr).
    max_label_frames_ratio : pseudo-label cap as a fraction of downsampled
        frames (bounds the CTC DP width; reference teacher filters use
        ``min_frames_per_token`` similarly, ``enc_dec_teacher_filters.py:177``).
    """

    def __init__(
        self,
        model,
        blank_id: int,
        subsampling_factor: int,
        config: TTAConfig,
        optimizer: Optional[optax.GradientTransformation] = None,
        num_negatives: int = 1,
        max_label_frames_ratio: float = 0.25,
        infer_batch: int = 4,
        label_fn: Optional[Callable] = None,
    ):
        self.model = model
        self.blank_id = blank_id
        self.ds = subsampling_factor
        self.config = config
        self.num_negatives = num_negatives
        self.max_label_frames_ratio = max_label_frames_ratio
        self.infer_batch = infer_batch
        self.label_fn = label_fn
        if optimizer is None:
            opt_args = dict(config.optim_args)
            lr = opt_args.pop("lr", 9e-5)
            optimizer = madgrad(learning_rate=lr, **opt_args)
        self.optimizer = optimizer
        self._adapt_cache: Dict[Tuple, Callable] = {}
        self._infer_cache: Dict[Tuple, Callable] = {}

    # -- param masking ----------------------------------------------------
    def _wrap_optimizer(self, params) -> optax.GradientTransformation:
        c = self.config
        if not (c.bitfit or c.freeze_subsampling or c.freeze_all_but_last_block_and_head or c.train_subsampling_only):
            return self.optimizer
        n_layers = getattr(self.model.config, "n_layers", None)
        labels = param_labels(
            params,
            bitfit=c.bitfit,
            freeze_subsampling=c.freeze_subsampling,
            last_block_and_head=c.freeze_all_but_last_block_and_head,
            subsampling_only=c.train_subsampling_only,
            n_layers=n_layers,
        )
        return masked_optimizer(self.optimizer, labels)

    # -- single adaptation step (traced) ----------------------------------
    def _forward(self, variables, batch, lengths):
        return self.model.apply(variables, batch, length=lengths)

    def _adapt_step(self, optimizer, extra_vars, max_tokens, carry, xs):
        params, opt_state, key = carry
        window, w_len = xs  # [F, W], scalar
        key, k_aug = jax.random.split(key)
        nn = self.num_negatives

        def do_step(params, opt_state):
            aug = jnp.repeat(window[None], nn, axis=0)
            aug = apply_augmentation_pipeline(
                aug, k_aug,
                self.config.spec_augment, self.config.frame_shuffle,
                self.config.cutout, self.config.random_noise,
                actual_len=w_len,
            )
            batch = jnp.concatenate([aug, window[None]], axis=0)  # [nn+1, F, W]
            lengths = jnp.full((nn + 1,), w_len, jnp.int32)

            def loss_fn(p):
                out = self._forward({"params": p, **extra_vars}, batch, lengths)
                lp = out["final_posteriors"]
                ds_len = out["length"][0]
                clean_lp = jax.lax.stop_gradient(lp[-1])
                labels, lab_len = greedy_labels(clean_lp, ds_len, self.blank_id, max_tokens)
                aug_lp = lp[:nn]
                T_ds = aug_lp.shape[1]
                loss = ctc_loss(
                    aug_lp,
                    jnp.full((nn,), ds_len, jnp.int32),
                    jnp.repeat(labels[None], nn, axis=0),
                    jnp.full((nn,), lab_len, jnp.int32),
                    blank_id=self.blank_id,
                ) / (T_ds * nn)
                return loss, (clean_lp, ds_len)

            (loss, (clean_lp, ds_len)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, new_opt_state = optimizer.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            return new_params, new_opt_state, clean_lp, ds_len, loss

        def skip(params, opt_state):
            T_ds = _ds_ceil(window.shape[-1], self.ds)
            V = self.blank_id + 1
            return params, opt_state, jnp.zeros((T_ds, V), jnp.float32), jnp.asarray(0, jnp.int32), jnp.asarray(0.0, jnp.float32)

        new_params, new_opt, clean_lp, ds_len, loss = jax.lax.cond(
            w_len > 0, do_step, skip, params, opt_state
        )
        return (new_params, new_opt, key), (clean_lp, ds_len, loss)

    def _build_adapt(self, W: int, N: int, extra_vars_treedef):
        """Jitted scan over (possibly permuted) windows; returns adapted
        params + per-window clean log-probs in *visit order*."""
        T_ds = W // self.ds
        max_tokens = max(8, int(T_ds * self.max_label_frames_ratio))

        def run(params, opt_state, extra_vars, windows, lengths, order, key):
            step = partial(self._adapt_step, self.optimizer_wrapped, extra_vars, max_tokens)
            xs = (windows[order], lengths[order])
            (params, opt_state, _), (clean_lps, ds_lens, losses) = jax.lax.scan(
                step, (params, opt_state, key), xs
            )
            return params, opt_state, clean_lps, ds_lens, losses

        # NOTE: no donation — madgrad's x0 state aliases the incoming params
        # buffer on the first call, and donating both trips XLA's
        # double-donation check.
        return jax.jit(run)

    # -- inference (no-grad chunked forward + stitch) ----------------------
    def _build_infer(self, W: int, N: int, total_ds: int):
        b = self.infer_batch
        V = self.blank_id + 1
        n_batches = -(-N // b)
        pad_N = n_batches * b

        def run(variables, windows, lengths, starts_ds):
            # pad to batch multiple
            if pad_N != N:
                windows = jnp.concatenate(
                    [windows, jnp.zeros((pad_N - N,) + windows.shape[1:], windows.dtype)]
                )
                lengths = jnp.concatenate([lengths, jnp.zeros((pad_N - N,), lengths.dtype)])
                starts_ds_p = jnp.concatenate([starts_ds, jnp.zeros((pad_N - N,), starts_ds.dtype)])
            else:
                starts_ds_p = starts_ds
            wb = windows.reshape(n_batches, b, *windows.shape[1:])
            lb = lengths.reshape(n_batches, b)
            sb = starts_ds_p.reshape(n_batches, b)

            def step(acc, xs):
                acc_probs, acc_counts = acc
                w, l, s = xs
                out = self._forward(variables, w, l)
                lp = out["final_posteriors"]  # [b, T_ds, V]
                ds_len = out["length"]
                probs = jnp.exp(lp)
                T_ds = lp.shape[1]
                fidx = jnp.arange(T_ds)[None, :]
                m = fidx < ds_len[:, None]
                pos = jnp.where(m, s[:, None] + fidx, total_ds)
                acc_probs = acc_probs.at[pos.reshape(-1)].add(
                    (probs * m[..., None]).reshape(-1, V), mode="drop"
                )
                acc_counts = acc_counts.at[pos.reshape(-1)].add(
                    m.reshape(-1).astype(jnp.float32), mode="drop"
                )
                return (acc_probs, acc_counts), None

            acc0 = (
                jnp.zeros((total_ds + 1, V), jnp.float32),
                jnp.zeros((total_ds + 1,), jnp.float32),
            )
            (acc_probs, acc_counts), _ = jax.lax.scan(step, acc0, (wb, lb, sb))
            return acc_probs[:total_ds], acc_counts[:total_ds]

        return jax.jit(run)

    # -- public API --------------------------------------------------------
    def __call__(
        self,
        variables: Dict[str, Any],
        spec: np.ndarray,  # [F, T] or [1, F, T]
        seq_len: int = -1,
        overlap: int = -1,
        return_params: bool = False,
        rng: Optional[jax.Array] = None,
        shuffle_rng: Optional[np.random.Generator] = None,
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
        if overlap % self.ds:
            raise ValueError(
                f"overlap ({overlap}) must be a multiple of the subsampling "
                f"factor ({self.ds})"  # reference asserts this, lcasr/lib.py:507
            )

        windows_np, lengths_np, starts_np, n_real = chunk_spectrogram(spec, seq_len, overlap)
        N, F, W = windows_np.shape
        total_ds = _ds_ceil(spec_n, self.ds) + _ds_ceil(W, self.ds)

        params = variables["params"]
        extra_vars = {k: v for k, v in variables.items() if k != "params"}
        self.optimizer_wrapped = self._wrap_optimizer(params)

        windows = jnp.asarray(windows_np)
        lengths = jnp.asarray(lengths_np)
        starts_ds = jnp.asarray(starts_np // self.ds)

        rng = rng if rng is not None else jax.random.PRNGKey(0)
        shuffle_rng = shuffle_rng or np.random.default_rng(0)

        t0 = time.time()
        adapted = params
        online_result = None

        if cfg.epochs > 0:
            akey = (W, N)
            if akey not in self._adapt_cache:
                self._adapt_cache[akey] = self._build_adapt(W, N, None)
            adapt = self._adapt_cache[akey]
            opt_state = self.optimizer_wrapped.init(params)
            adapted = params
            for epoch in range(cfg.epochs):
                if cfg.shuffle:
                    order_real = shuffle_rng.permutation(n_real)
                    order = np.concatenate([order_real, np.arange(n_real, N)])
                else:
                    order = np.arange(N)
                rng, ekey = jax.random.split(rng)
                adapted, opt_state, clean_lps, ds_lens, losses = adapt(
                    adapted, opt_state, extra_vars, windows, lengths,
                    jnp.asarray(order), ekey,
                )
                if cfg.online:
                    # stitch the adaptation pass's own clean outputs
                    # (reference online mode, lcasr/lib.py:583-590)
                    from dynamic_asr_eval_tpu.ops.stitch import stitch_chunk_probs

                    inv = jnp.asarray(np.argsort(order))
                    online_result = stitch_chunk_probs(
                        jnp.exp(clean_lps)[inv], ds_lens[inv], starts_ds, total_ds
                    )

        if cfg.online and online_result is not None:
            log_avg, acc_counts = online_result
        else:
            ikey = (W, N, total_ds)
            if ikey not in self._infer_cache:
                self._infer_cache[ikey] = self._build_infer(W, N, total_ds)
            infer = self._infer_cache[ikey]
            acc_probs, acc_counts = infer(
                {"params": adapted, **extra_vars}, windows, lengths, starts_ds
            )
            log_avg = jnp.log(
                jnp.maximum(acc_probs / jnp.maximum(acc_counts[:, None], 1.0), 1e-12)
            )

        counts = np.asarray(acc_counts)
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


def chunked_inference(
    model,
    variables,
    spec: np.ndarray,
    seq_len: int,
    overlap: int,
    blank_id: int,
    subsampling_factor: int,
    infer_batch: int = 4,
) -> np.ndarray:
    """Pure windowed inference (the reference's epochs=0 trick turns
    ``dynamic_eval`` into this path; ``run_in_dataset_eval.py:96-99``)."""
    cfg = TTAConfig(seq_len=seq_len, overlap=overlap, epochs=0, shuffle=False)
    engine = DynamicEvalEngine(
        model, blank_id, subsampling_factor, cfg, infer_batch=infer_batch
    )
    return engine(variables, spec, seq_len, overlap).logits
