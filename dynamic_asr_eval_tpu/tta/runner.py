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
  (epochs=1, no shuffle, no final pass; ``:583-590``); offline mode does
  a fresh no-grad pass with the adapted weights (``:596-612``);
- stitching = overlap probability averaging then log (``:615-629``);
- parameter restore-invariance is free: parameters are immutable pytrees, the
  engine returns adapted params separately (``return_params``,
  ``lcasr/lib.py:631-637``).

TPU-first design (BASELINE.json north star: "per-recording SGD updates
without host round-trips"):

- the spectrogram is uploaded ONCE; windows are sliced on device inside the
  scan (``lax.dynamic_slice``) — no ``[N, F, W]`` window stack either on host
  or in HBM;
- pseudo-label greedy decode happens on device (``ops.ctc.greedy_labels``) —
  the reference ships logits to CPU every chunk (``lcasr/lib.py:559``);
- the whole per-recording adaptation (including optimizer init) is ONE jitted
  call: a ``lax.scan`` over windows;
- stitched log-probs STAY on device (``EngineOutput.logits`` is a
  ``jax.Array``); greedy decoding of the stitched matrix is on-device too, so
  only token ids ever cross back to the host.  ``EngineOutput.numpy_logits()``
  materializes the matrix for callers that need it (pickled results).
- window count is bucket-padded (powers of two) so recompiles are bounded;
  padded windows are skipped with ``lax.cond``.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dynamic_asr_eval_tpu.augment import apply_augmentation_pipeline
from dynamic_asr_eval_tpu.config import TTAConfig
from dynamic_asr_eval_tpu.ops.chunk import chunk_starts_and_lengths, pad_num_chunks
from dynamic_asr_eval_tpu.ops.ctc import ctc_loss, greedy_labels
from dynamic_asr_eval_tpu.optim.madgrad import madgrad
from dynamic_asr_eval_tpu.optim.masks import masked_optimizer, param_labels


def _ds_ceil(x, factor):
    return -(-x // factor)


@partial(jax.jit, static_argnums=(2, 3))
def _jit_greedy_stitched(logits, counts, blank_id: int, max_tokens: int):
    n_valid = jnp.sum(counts > 0)
    return greedy_labels(logits, n_valid, blank_id, max_tokens)


class EngineOutput:
    """Result of a dynamic-eval run.  ``logits``/``counts`` are device arrays
    (full padded buffer); use ``numpy_logits()`` for the trimmed host matrix
    or ``greedy_ids()`` for an on-device decode."""

    def __init__(self, logits, counts, params, elapsed: float, blank_id: int):
        self.logits = logits  # [total_ds, V] device log-probs
        self.counts = counts  # [total_ds] device coverage counts
        self.params = params
        self.elapsed = elapsed
        self._blank_id = blank_id

    def numpy_logits(self) -> np.ndarray:
        counts = np.asarray(self.counts)
        return np.asarray(self.logits)[counts > 0].astype(np.float32)

    def greedy_ids(self, max_tokens: Optional[int] = None) -> np.ndarray:
        """On-device greedy CTC decode of the stitched matrix; only the token
        ids are transferred to host."""
        T = self.logits.shape[0]
        max_tokens = max_tokens or max(8, T // 2)
        ids, length = _jit_greedy_stitched(
            self.logits, self.counts, self._blank_id, max_tokens
        )
        return np.asarray(ids)[: int(length)]


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
    transfer_dtype : dtype for the one-time spectrogram upload (bf16 halves
        the host→device traffic; compute still follows the model config).
    """

    def __init__(
        self,
        model,
        blank_id: int,
        subsampling_factor: int,
        config: TTAConfig,
        optimizer: Optional[optax.GradientTransformation] = None,
        num_negatives: int = 1,
        max_label_frames_ratio: float = 1.0,
        infer_batch: int = 4,
        transfer_dtype=jnp.float32,
        augment_fn=None,
        out_len_fn=None,
        n_classes=None,
        lm_adapter=None,
        lm_beam_kwargs: Optional[Dict[str, Any]] = None,
        mesh=None,
        tokenizer=None,
    ):
        self.model = model
        self.blank_id = blank_id
        self.ds = subsampling_factor
        self.config = config
        self.num_negatives = num_negatives
        self.max_label_frames_ratio = max_label_frames_ratio
        self.infer_batch = infer_batch
        self.transfer_dtype = transfer_dtype
        # optional override of the spectrogram augmentation pipeline —
        # waveform-domain backends (wav2vec2) pass augment.waveform's chain;
        # signature: (batch [B, F, W], key, actual_len) -> [B, F, W]
        self.augment_fn = augment_fn
        # static output length for a window of W input frames; conformer-style
        # models produce ceil(W/ds), conv-VALID models (wav2vec2) fewer —
        # must match the model so lax.cond skip branches agree on shapes
        self.out_len_fn = out_len_fn or (lambda W: -(-W // subsampling_factor))
        # output dim: vocab+1 with blank last (reference convention) unless
        # stated (wav2vec2 uses blank id 0 with n_classes == vocab_size)
        self.n_classes = n_classes if n_classes is not None else blank_id + 1
        # LM-fused pseudo-labels (reference ``lm_tta_beams``,
        # lcasr/lib.py:515,558-563): when an LM adapter is supplied and
        # ``config.lm_tta_beams > 0``, pseudo-labels come from the on-device
        # LM beam search instead of greedy — entirely inside the adapt scan
        # (the reference ships logits to CPU and runs pyctcdecode per chunk).
        # Divergence note: the reference round-trips pseudo-labels through
        # tokenizer TEXT before CTC — on the greedy path too, not just the
        # beam (lcasr/lib.py:560,569-571) — while we use the decoded token
        # ids directly (no host sync inside the scan).  The transcript is
        # identical either way; only the CTC target segmentation can differ,
        # and only when the model emits a non-tokenizer-canonical piece path
        # (quantified in tta/retokenize.py + tests/test_retokenize.py).
        # ``config.pseudo_label_retokenize`` + ``tokenizer=`` opts into the
        # reference-exact host round-trip per window.
        self.lm_adapter = lm_adapter
        self.lm_beam_kwargs = dict(lm_beam_kwargs or {})
        self.tokenizer = tokenizer
        if getattr(config, "pseudo_label_retokenize", False) and tokenizer is None:
            raise ValueError(
                "pseudo_label_retokenize=True needs tokenizer= on the engine")
        # data-parallel inference over windows (SURVEY §2.3 row 1): with a
        # ('dp','tp') mesh, the no-grad chunked forward shards its window
        # batch over dp (GSPMD inserts the stitch-accumulator reduction);
        # the adaptation scan stays sequential by algorithm (online SGD).
        # Pass tp-sharded variables (parallel.shard_params) for TP on top.
        self.mesh = mesh
        if optimizer is None:
            opt_args = dict(config.optim_args)
            lr = opt_args.pop("lr", 9e-5)
            optimizer = madgrad(learning_rate=lr, **opt_args)
        self.optimizer = optimizer
        self.optimizer_wrapped: Optional[optax.GradientTransformation] = None
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

    def _forward(self, variables, batch, lengths):
        return self.model.apply(variables, batch, length=lengths)

    def _print_pseudo_labels(self, labels, lab_len, noisy, noisy_len):
        """Host side of the opt-in per-chunk debug print
        (``config.print_pseudo_labels``; lcasr/lib.py:566-568)."""
        ids = [int(t) for t in np.asarray(labels)[: int(lab_len)]]
        nids = [int(t) for t in np.asarray(noisy)[: int(noisy_len)]]
        if self.tokenizer is not None:
            ids = self.tokenizer.decode(ids)
            nids = self.tokenizer.decode(nids)
        print(f"Pseudo targets: {ids}")
        print(f"Noisy predictions: {nids}")
        print("\n--\n")

    def _pseudo_labels(self, clean_lp, ds_len, max_tokens: int):
        """Pseudo-label decode of the clean stream — greedy, or the LM-fused
        device beam when ``lm_tta_beams`` is active (lcasr/lib.py:558-563).
        Both paths return (labels [max_tokens], length) with matching shapes
        so they compose with ``lax.cond`` skip branches."""
        beams = int(getattr(self.config, "lm_tta_beams", 0) or 0)
        if self.lm_adapter is None or beams <= 0:
            labels, lab_len = greedy_labels(
                clean_lp, ds_len, self.blank_id, max_tokens)
        else:
            from dynamic_asr_eval_tpu.ops.beam_search import beam_search_device

            toks, lens, _ = beam_search_device(
                clean_lp,
                self.lm_adapter,
                beam_width=beams,
                blank_id=self.blank_id,
                valid_frames=ds_len,
                max_tokens=max_tokens,
                **self.lm_beam_kwargs,
            )
            labels = toks[0]
            lab_len = jnp.minimum(lens[0], max_tokens).astype(jnp.int32)
        if getattr(self.config, "pseudo_label_retokenize", False):
            # reference-exact mode: decode→re-encode on the host per window
            # (lcasr/lib.py:560,569-571) — a host sync inside the scan, so
            # strictly slower than the default id-path labels.  Requires a
            # host-callback-capable runtime (CPU / standard TPU PjRt; the
            # axon-tunnel runtime rejects send/recv callbacks at run time)
            from dynamic_asr_eval_tpu.tta.retokenize import make_retokenize_callback

            labels, lab_len = jax.pure_callback(
                make_retokenize_callback(self.tokenizer, max_tokens),
                (jax.ShapeDtypeStruct((max_tokens,), jnp.int32),
                 jax.ShapeDtypeStruct((), jnp.int32)),
                labels.astype(jnp.int32), lab_len,
            )
        return labels, lab_len

    # -- single adaptation step (traced) ----------------------------------
    def _adapt_step(self, optimizer, extra_vars, max_tokens, total_ds, W, spec_dev, carry, xs):
        """One window: slice from the on-device spectrogram → augment →
        forward [aug…, clean] → on-device pseudo-label → CTC grad step.
        In online mode the carry also holds the stitching accumulators."""
        params, opt_state, key, acc = carry
        start, w_len, start_ds = xs  # scalars
        key, k_aug = jax.random.split(key)
        nn = self.num_negatives
        F = spec_dev.shape[0]
        window = jax.lax.dynamic_slice(spec_dev, (0, start), (F, W)).astype(jnp.float32)
        T_ds_static = self.out_len_fn(W)
        V = self.n_classes

        def do_step(params, opt_state):
            aug = jnp.repeat(window[None], nn, axis=0)
            if self.augment_fn is not None:
                aug = self.augment_fn(aug, k_aug, w_len)
            else:
                aug = apply_augmentation_pipeline(
                    aug, k_aug,
                    self.config.spec_augment, self.config.frame_shuffle,
                    self.config.cutout, self.config.random_noise,
                    actual_len=w_len,
                )
            if self.config.entropy_augmentation:
                # entropy-gradient perturbation (lcasr/lib.py:86-99): add
                # 1e-3 · ∂H(model(x))/∂x to the augmented copies
                def mean_entropy(a):
                    out = self._forward(
                        {"params": params, **extra_vars}, a,
                        jnp.full((nn,), w_len, jnp.int32),
                    )
                    lp = out["final_posteriors"]
                    return jnp.mean(-jnp.sum(jnp.exp(lp) * lp, axis=-1))

                aug = jax.lax.stop_gradient(
                    aug + 1e-3 * jax.grad(mean_entropy)(aug)
                )

            batch = jnp.concatenate([aug, window[None]], axis=0)  # [nn+1, F, W]
            lengths = jnp.full((nn + 1,), w_len, jnp.int32)

            def loss_fn(p):
                out = self._forward({"params": p, **extra_vars}, batch, lengths)
                lp = out["final_posteriors"]
                ds_len = out["length"][0]
                clean_lp = jax.lax.stop_gradient(lp[-1])
                labels, lab_len = self._pseudo_labels(clean_lp, ds_len, max_tokens)
                aug_lp = lp[:nn]
                T_ds = aug_lp.shape[1]
                # normalize by the chunk's ACTUAL downsampled length — the
                # reference divides by the ragged chunk's N (lcasr/lib.py:573),
                # and padded-length division would downweight tail chunks
                loss = ctc_loss(
                    aug_lp,
                    jnp.full((nn,), ds_len, jnp.int32),
                    jnp.repeat(labels[None], nn, axis=0),
                    jnp.full((nn,), lab_len, jnp.int32),
                    blank_id=self.blank_id,
                ) / (jnp.maximum(ds_len, 1) * nn)
                if self.config.print_pseudo_labels:
                    # per-chunk debug parity (lcasr/lib.py:566-568): also
                    # decode the first NOISY stream greedily for the print
                    noisy, noisy_len = greedy_labels(
                        jax.lax.stop_gradient(aug_lp[0]), ds_len,
                        self.blank_id, max_tokens)
                    return loss, (clean_lp, ds_len,
                                  (labels, lab_len, noisy, noisy_len))
                return loss, (clean_lp, ds_len)

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            if self.config.print_pseudo_labels:
                clean_lp, ds_len, dbg = aux
                jax.debug.callback(self._print_pseudo_labels, *dbg)
            else:
                clean_lp, ds_len = aux
            updates, new_opt_state = optimizer.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            return new_params, new_opt_state, clean_lp, ds_len, loss

        def skip(params, opt_state):
            return (
                params, opt_state,
                jnp.zeros((T_ds_static, V), jnp.float32),
                jnp.asarray(0, jnp.int32),
                jnp.asarray(0.0, jnp.float32),
            )

        new_params, new_opt, clean_lp, ds_len, loss = jax.lax.cond(
            w_len > 0, do_step, skip, params, opt_state
        )

        if acc is not None:  # online stitching accumulation (order-free scatter)
            acc_probs, acc_counts = acc
            fidx = jnp.arange(T_ds_static)
            m = fidx < ds_len
            pos = jnp.where(m, start_ds + fidx, total_ds)
            acc_probs = acc_probs.at[pos].add(
                jnp.exp(clean_lp) * m[:, None], mode="drop"
            )
            acc_counts = acc_counts.at[pos].add(m.astype(jnp.float32), mode="drop")
            acc = (acc_probs, acc_counts)

        return (new_params, new_opt, key, acc), loss

    def _make_adapt_run(self, W: int, N: int, total_ds: int, online: bool):
        """The per-recording adaptation as an UNJITTED pure function —
        ``_build_adapt`` jits it directly; ``_build_adapt_batched`` vmaps the
        record axis over it (records-level data parallelism)."""
        T_ds = self.out_len_fn(W)
        max_tokens = max(8, int(T_ds * self.max_label_frames_ratio))
        V = self.n_classes

        def run(params, opt_state, extra_vars, spec_dev, starts, lengths, starts_ds, order, key):
            step = partial(
                self._adapt_step, self.optimizer_wrapped, extra_vars,
                max_tokens, total_ds, W, spec_dev,
            )
            xs = (starts[order], lengths[order], starts_ds[order])
            acc0 = (
                (jnp.zeros((total_ds + 1, V), jnp.float32),
                 jnp.zeros((total_ds + 1,), jnp.float32))
                if online else None
            )
            (params, opt_state, _, acc), losses = jax.lax.scan(
                step, (params, opt_state, key, acc0), xs
            )
            if online:
                log_avg = jnp.log(
                    jnp.maximum(
                        acc[0][:total_ds] / jnp.maximum(acc[1][:total_ds, None], 1.0),
                        1e-12,
                    )
                )
                return params, opt_state, losses, log_avg, acc[1][:total_ds]
            return params, opt_state, losses

        return run

    def _build_adapt(self, W: int, N: int, total_ds: int, online: bool):
        """One jitted call per recording-shape bucket: optimizer init + scan
        over windows (+ online stitching).

        NOTE: no donation of params — madgrad's x0 state aliases the
        incoming params buffer on the first call (double-donation trap)."""
        return jax.jit(self._make_adapt_run(W, N, total_ds, online))

    def _build_adapt_batched(self, W: int, N: int, total_ds: int, online: bool):
        """Records-level DP: the record axis is vmapped over the per-recording
        scan (params/opt-state/stitch accumulators all carry an [R, ...] lead
        axis — R independent adaptations in one device program).  With a mesh
        the vmapped program is wrapped in ``shard_map`` over dp — records-DP
        is embarrassingly parallel, so expressing the split explicitly (each
        device runs the single-device program on its R/dp records, zero
        collectives) beats handing GSPMD a sharded batch to re-derive the
        same thing; it also keeps the per-device executable identical to the
        proven no-mesh program."""
        run = self._make_adapt_run(W, N, total_ds, online)
        # (params, opt_state, extra_vars, spec, starts, lengths, starts_ds,
        #  order, key) — everything per-record except the shared extra_vars
        batched = jax.vmap(run, in_axes=(0, 0, None, 0, 0, 0, 0, 0, 0))
        return jax.jit(self._records_shard_map(batched, replicated_argnum=2))

    def _records_shard_map(self, batched_fn, replicated_argnum: int):
        """Wrap a records-vmapped function in ``shard_map`` over the mesh dp
        axis: every input pytree leaf except ``extra_vars``
        (``replicated_argnum``) carries a leading record axis split over dp;
        every output leaf does too."""
        if self.mesh is None:
            return batched_fn
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        dp = P("dp")

        def wrapped(*args):
            specs = tuple(
                jax.tree.map(lambda _: P(), a) if i == replicated_argnum
                else jax.tree.map(lambda _: dp, a)
                for i, a in enumerate(args)
            )
            out_shape = jax.eval_shape(batched_fn, *args)
            out_specs = jax.tree.map(lambda _: dp, out_shape)
            return shard_map(
                batched_fn, mesh=self.mesh, in_specs=specs,
                out_specs=out_specs, check_vma=False,
            )(*args)

        return wrapped

    def _build_opt_init(self):
        def init(params):
            return self.optimizer_wrapped.init(params)

        return jax.jit(init)

    def _build_opt_init_batched(self):
        def init(params_b):
            return jax.vmap(self.optimizer_wrapped.init)(params_b)

        if self.mesh is None:
            return jax.jit(init)
        # pin the record axis of every state leaf to dp — left to XLA the
        # vmapped init comes back REPLICATED (each device holding all R
        # records' Adam moments, (R-1)x wasted per-device HBM at scale);
        # caught by test_dp_records_per_device_memory_matches_single_record
        from jax.sharding import NamedSharding, PartitionSpec as P

        dp = NamedSharding(self.mesh, P("dp"))

        def init_sharded(params_b):
            return jax.tree.map(
                lambda a: jax.lax.with_sharding_constraint(a, dp), init(params_b))

        return jax.jit(init_sharded)

    # -- inference (no-grad chunked forward + stitch) ----------------------
    def _make_infer_run(self, W: int, N: int, total_ds: int, use_mesh: bool = True):
        """Unjitted chunked no-grad forward + stitch; ``use_mesh=False`` for
        the records-batched variant (there the RECORD axis is the dp axis, so
        window-level dp sharding must stay off)."""
        b = self.infer_batch
        use_mesh = use_mesh and self.mesh is not None
        if use_mesh:
            # window batch must tile the dp axis; each scan step then runs
            # dp-many windows per device group in parallel
            ndp = int(self.mesh.shape.get("dp", 1))
            b = -(-b // ndp) * ndp
        V = self.n_classes
        n_batches = -(-N // b)
        pad_N = n_batches * b

        def run(params, extra_vars, spec_dev, starts, lengths, starts_ds):
            variables = {"params": params, **extra_vars}
            F = spec_dev.shape[0]
            if pad_N != N:
                zpad = lambda a: jnp.concatenate([a, jnp.zeros((pad_N - N,), a.dtype)])
                starts, lengths, starts_ds = zpad(starts), zpad(lengths), zpad(starts_ds)
            sb = starts.reshape(n_batches, b)
            lb = lengths.reshape(n_batches, b)
            db = starts_ds.reshape(n_batches, b)

            def step(acc, xs):
                acc_probs, acc_counts = acc
                s, l, d = xs
                w = jax.vmap(
                    lambda st: jax.lax.dynamic_slice(spec_dev, (0, st), (F, W))
                )(s).astype(jnp.float32)
                if use_mesh:
                    from jax.sharding import NamedSharding, PartitionSpec

                    w = jax.lax.with_sharding_constraint(
                        w, NamedSharding(self.mesh, PartitionSpec("dp"))
                    )
                out = self._forward(variables, w, l)
                lp = out["final_posteriors"]  # [b, T_ds, V]
                ds_len = jnp.where(l > 0, out["length"], 0)
                probs = jnp.exp(lp)
                T_ds = lp.shape[1]
                fidx = jnp.arange(T_ds)[None, :]
                m = fidx < ds_len[:, None]
                pos = jnp.where(m, d[:, None] + fidx, total_ds)
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
            (acc_probs, acc_counts), _ = jax.lax.scan(step, acc0, (sb, lb, db))
            log_avg = jnp.log(
                jnp.maximum(
                    acc_probs[:total_ds] / jnp.maximum(acc_counts[:total_ds, None], 1.0),
                    1e-12,
                )
            )
            return log_avg, acc_counts[:total_ds]

        return run

    def _build_infer(self, W: int, N: int, total_ds: int):
        return jax.jit(self._make_infer_run(W, N, total_ds))

    def _build_infer_batched(self, W: int, N: int, total_ds: int):
        run = self._make_infer_run(W, N, total_ds, use_mesh=False)
        batched = jax.vmap(run, in_axes=(0, None, 0, 0, 0, 0))
        return jax.jit(self._records_shard_map(batched, replicated_argnum=1))

    # -- host-side plan ----------------------------------------------------
    def _plan(self, spec: np.ndarray, seq_len: int, overlap: int):
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
        if spec_n > seq_len and seq_len % self.ds:
            # starts_ds = start // ds must be exact or overlapping windows
            # stitch one frame off at every boundary
            raise ValueError(
                f"seq_len ({seq_len}) must be a multiple of the subsampling "
                f"factor ({self.ds}) when the spectrogram spans multiple windows"
            )
        starts, lengths = chunk_starts_and_lengths(spec_n, seq_len, overlap)
        n_real = len(starts)
        W = seq_len
        N = pad_num_chunks(n_real)
        starts_np = np.zeros((N,), np.int32)
        lengths_np = np.zeros((N,), np.int32)
        starts_np[:n_real] = starts
        lengths_np[:n_real] = lengths
        # Derive the padded spec length and the stitched-buffer length from
        # the WINDOW-COUNT BUCKET alone, never from spec_n: pad_num_chunks
        # bounds the number of distinct scan lengths, but T_pad and total_ds
        # are also part of the compiled program's signature — deriving them
        # from spec_n (the old ``max(last_start + W, spec_n)``) re-keyed the
        # executable on every distinct recording length, recompiling once per
        # RECORDING on heterogeneous corpora (measured on chip: corpus RTFx
        # 83 → 278 from this change alone, PERF.md round-5).  The extra tail
        # is zero spec under zero-length windows: no stitch contribution,
        # ``counts == 0`` there, so trimmed outputs are unchanged.
        if n_real > 1:
            T_pad = (N - 1) * (W - overlap) + W  # span of a full bucket
        else:
            # single real window: W == spec_n (or the caller's smaller seq),
            # so the window size itself varies per recording and bucketing
            # the tail buys no executable reuse
            T_pad = int(max(starts_np.max() + W, spec_n))
        spec_padded = np.zeros((spec.shape[0], T_pad), dtype=spec.dtype)
        spec_padded[:, :spec_n] = spec
        total_ds = _ds_ceil(T_pad, self.ds) + _ds_ceil(W, self.ds)
        return spec_padded, spec_n, W, N, n_real, starts_np, lengths_np, total_ds

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
        adapt_only: bool = False,
    ) -> EngineOutput:
        """``adapt_only=True`` skips the final stitched-inference pass and
        returns only the adapted parameters (the concat drivers' adapt pass —
        ``run_half_concat_eval.py:64-160`` avoids allocating stitched logits
        the same way)."""
        cfg = self.config
        spec_padded, spec_n, W, N, n_real, starts_np, lengths_np, total_ds = self._plan(
            spec, seq_len, overlap
        )

        params = variables["params"]
        extra_vars = {k: v for k, v in variables.items() if k != "params"}
        if self.optimizer_wrapped is None:
            self.optimizer_wrapped = self._wrap_optimizer(params)

        rng = rng if rng is not None else jax.random.PRNGKey(0)
        shuffle_rng = shuffle_rng or np.random.default_rng(0)

        t0 = time.time()
        # ONE host→device upload per recording
        spec_dev = jnp.asarray(spec_padded, self.transfer_dtype)
        starts = jnp.asarray(starts_np)
        lengths = jnp.asarray(lengths_np)
        starts_ds = jnp.asarray(starts_np // self.ds)

        adapted = params
        online_result = None

        if cfg.epochs > 0:
            akey = (W, N, total_ds, cfg.online)
            if akey not in self._adapt_cache:
                self._adapt_cache[akey] = self._build_adapt(W, N, total_ds, cfg.online)
                self._adapt_cache["opt_init"] = self._build_opt_init()
            adapt = self._adapt_cache[akey]
            opt_state = self._adapt_cache["opt_init"](params)
            for epoch in range(cfg.epochs):
                if cfg.shuffle:
                    order_real = shuffle_rng.permutation(n_real)
                    order = np.concatenate([order_real, np.arange(n_real, N)])
                else:
                    order = np.arange(N)
                rng, ekey = jax.random.split(rng)
                if cfg.online:
                    # stitching happens inside the adaptation scan itself
                    # (reference online mode, lcasr/lib.py:583-590)
                    adapted, opt_state, losses, log_avg, counts = adapt(
                        adapted, opt_state, extra_vars, spec_dev,
                        starts, lengths, starts_ds, jnp.asarray(order), ekey,
                    )
                    online_result = (log_avg, counts)
                else:
                    adapted, opt_state, losses = adapt(
                        adapted, opt_state, extra_vars, spec_dev,
                        starts, lengths, starts_ds, jnp.asarray(order), ekey,
                    )

        if adapt_only:
            jax.block_until_ready(adapted)
            return EngineOutput(
                logits=None, counts=None, params=adapted,
                elapsed=time.time() - t0, blank_id=self.blank_id,
            )

        if cfg.online and online_result is not None:
            log_avg, counts = online_result
        else:
            ikey = (W, N, total_ds)
            if ikey not in self._infer_cache:
                self._infer_cache[ikey] = self._build_infer(W, N, total_ds)
            log_avg, counts = self._infer_cache[ikey](
                adapted, extra_vars, spec_dev, starts, lengths, starts_ds
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


    # -- records-level data parallelism -------------------------------------
    def batched(
        self,
        variables: Dict[str, Any],
        specs,  # list of [F, T_r] (or [1, F, T_r]) spectrograms
        seq_len: int = -1,
        overlap: int = -1,
        rng: Optional[jax.Array] = None,
        shuffle_rng: Optional[np.random.Generator] = None,
        rngs=None,  # optional [R] per-record keys (else split from rng)
    ):
        """Adapt R recordings SIMULTANEOUSLY (``--dp_records``, SURVEY §2.3
        row 1: one recording(-group) per device).  Every recording runs the
        same independent per-recording adaptation as :meth:`__call__` — the
        record axis is vmapped, and when the engine carries a mesh it is
        sharded over dp, so each dp slice holds only its own records' param
        copies, optimizer state, and stitch accumulators.

        Returns ``List[EngineOutput]`` (one per input recording, same order).

        Memory: R divergent parameter copies + optimizer states live at once
        (that is the point — they adapt in parallel); callers group records
        into dp-sized batches.  With a mesh, R must divide evenly over dp.

        Window-size note: the whole group shares one window size
        ``W = min(seq_len, max record length)``.  A record shorter than the
        group max therefore runs at W (its tail windows zero-padded and
        length-masked) rather than at the ``W = its own length`` a serial
        `__call__` would pick — numerically identical stitched output, but a
        different (bigger) compiled shape than its serial run."""
        cfg = self.config
        if getattr(cfg, "pseudo_label_retokenize", False):
            raise ValueError(
                "pseudo_label_retokenize (host callback per window) is not "
                "supported under --dp_records; run serially for exact mode")
        if getattr(cfg, "print_pseudo_labels", False):
            raise ValueError(
                "print_pseudo_labels (per-chunk host debug print) is not "
                "supported under --dp_records; run serially to debug")
        seq_len = cfg.seq_len if seq_len == -1 else seq_len
        overlap = cfg.overlap if overlap == -1 else overlap
        specs = [np.asarray(s) for s in specs]
        specs = [s[0] if s.ndim == 3 else s for s in specs]
        R = len(specs)
        if self.mesh is not None:
            ndp = int(self.mesh.shape.get("dp", 1))
            if R % ndp:
                raise ValueError(
                    f"records batch ({R}) must be a multiple of the mesh dp "
                    f"size ({ndp}); pad the group (repeat a record, drop its "
                    "duplicate result)")
        F = specs[0].shape[0]
        max_n = max(s.shape[-1] for s in specs)
        W = min(seq_len, max_n)
        if max_n <= W:
            # every record fits one window — mirror _plan's single-window
            # overlap zeroing so such groups don't trip the multiple-of-ds
            # check that only matters for stitched boundaries
            overlap = 0
        if overlap % self.ds:
            raise ValueError(
                f"overlap ({overlap}) must be a multiple of the subsampling "
                f"factor ({self.ds})")
        if max_n > W and W % self.ds:
            raise ValueError(
                f"seq_len ({W}) must be a multiple of the subsampling factor "
                f"({self.ds}) when any spectrogram spans multiple windows")

        plans = [chunk_starts_and_lengths(s.shape[-1], W, overlap if s.shape[-1] > W else 0)
                 for s in specs]
        N = pad_num_chunks(max(len(p[0]) for p in plans))
        starts_np = np.zeros((R, N), np.int32)
        lengths_np = np.zeros((R, N), np.int32)
        for r, (st, ln) in enumerate(plans):
            starts_np[r, : len(st)] = st
            lengths_np[r, : len(ln)] = ln
        # same bucket-span shape derivation as _plan: keep the compiled
        # program keyed on (W, N), not on the group's max recording length
        if max_n > W:
            T_pad = (N - 1) * (W - overlap) + W
        else:
            T_pad = int(max(starts_np.max() + W, max_n))
        spec_b = np.zeros((R, F, T_pad), dtype=specs[0].dtype)
        for r, s in enumerate(specs):
            spec_b[r, :, : s.shape[-1]] = s
        total_ds = _ds_ceil(T_pad, self.ds) + _ds_ceil(W, self.ds)

        params = variables["params"]
        extra_vars = {k: v for k, v in variables.items() if k != "params"}
        if self.optimizer_wrapped is None:
            self.optimizer_wrapped = self._wrap_optimizer(params)
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        shuffle_rng = shuffle_rng or np.random.default_rng(0)

        t0 = time.time()
        dp_shard = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            def dp_shard(a):  # noqa: F811 — shard axis 0 over dp
                spec = PartitionSpec(*(("dp",) + (None,) * (a.ndim - 1)))
                return jax.device_put(a, NamedSharding(self.mesh, spec))

        def put(a):
            a = jnp.asarray(a)
            return dp_shard(a) if dp_shard is not None else a

        spec_dev = put(np.asarray(spec_b, self.transfer_dtype))
        starts = put(starts_np)
        lengths = put(lengths_np)
        starts_ds = put(starts_np // self.ds)
        keys = put(jnp.stack(list(rngs)) if rngs is not None
                   else jax.random.split(rng, R))

        # R divergent copies of the params (and optimizer state): tiled once
        # on device, sharded over dp when a mesh is present
        tile_key = ("tile", R)
        if tile_key not in self._adapt_cache:
            self._adapt_cache[tile_key] = jax.jit(
                lambda p: jax.tree.map(
                    lambda a: jnp.broadcast_to(a[None], (R,) + a.shape), p))
        adapted = self._adapt_cache[tile_key](params)
        if dp_shard is not None:
            adapted = jax.tree.map(dp_shard, adapted)

        online_result = None
        if cfg.epochs > 0:
            akey = ("dp_records", W, N, total_ds, cfg.online, R)
            if akey not in self._adapt_cache:
                self._adapt_cache[akey] = self._build_adapt_batched(W, N, total_ds, cfg.online)
                self._adapt_cache["opt_init_b"] = self._build_opt_init_batched()
            adapt = self._adapt_cache[akey]
            opt_state = self._adapt_cache["opt_init_b"](adapted)
            if cfg.shuffle:
                # pre-draw every epoch's permutation RECORD-major (all of
                # record r's epochs before record r+1) — the order the serial
                # loop consumes shuffle_rng in — so --dp_records reproduces
                # the serial run even with shuffle=True and epochs>1
                orders_by_record = [
                    [np.concatenate([shuffle_rng.permutation(len(plans[r][0])),
                                     np.arange(len(plans[r][0]), N)])
                     for _ in range(cfg.epochs)]
                    for r in range(R)
                ]
            for epoch in range(cfg.epochs):
                if cfg.shuffle:
                    order = np.stack([
                        orders_by_record[r][epoch] for r in range(R)
                    ]).astype(np.int32)
                else:
                    order = np.broadcast_to(np.arange(N, dtype=np.int32), (R, N))
                # mirror the serial path's `rng, ekey = jax.random.split(rng)`
                # per record, so a record's augmentation-noise stream is
                # IDENTICAL whether it runs serially or in a records batch
                sk = jax.vmap(jax.random.split)(keys)
                keys, ekeys = sk[:, 0], sk[:, 1]
                if cfg.online:
                    adapted, opt_state, losses, log_avg, counts = adapt(
                        adapted, opt_state, extra_vars, spec_dev,
                        starts, lengths, starts_ds, put(order), ekeys,
                    )
                    online_result = (log_avg, counts)
                else:
                    adapted, opt_state, losses = adapt(
                        adapted, opt_state, extra_vars, spec_dev,
                        starts, lengths, starts_ds, put(order), ekeys,
                    )

        if cfg.online and online_result is not None:
            log_avg, counts = online_result
        else:
            ikey = ("dp_records", W, N, total_ds, R)
            if ikey not in self._infer_cache:
                self._infer_cache[ikey] = self._build_infer_batched(W, N, total_ds)
            log_avg, counts = self._infer_cache[ikey](
                adapted, extra_vars, spec_dev, starts, lengths, starts_ds
            )

        log_avg.block_until_ready()
        elapsed = time.time() - t0
        return [
            EngineOutput(
                logits=log_avg[r], counts=counts[r], params=None,
                elapsed=elapsed / R, blank_id=self.blank_id,
            )
            for r in range(R)
        ]


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
    """Pure windowed inference returning the trimmed host logit matrix (the
    reference's epochs=0 trick turns ``dynamic_eval`` into this path;
    ``run_in_dataset_eval.py:96-99``)."""
    cfg = TTAConfig(seq_len=seq_len, overlap=overlap, epochs=0, shuffle=False)
    engine = DynamicEvalEngine(
        model, blank_id, subsampling_factor, cfg, infer_batch=infer_batch
    )
    return engine(variables, spec, seq_len, overlap).numpy_logits()
