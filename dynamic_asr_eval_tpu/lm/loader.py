"""LM checkpoint loading + beam-search factory.

Capability parity with ``lib.load_beamsearch`` (``lcasr/lib.py:37-72``): load
the transformer LM checkpoint named by ``paths.checkpoints.lm``, wrap it with
the fusion hyperparameters (defaults α=0.45 β=1.53 prune=3.17 top_am=−6,
cache 128 — the reference's published operating point), and return a callable
``beam_search_fn(log_probs, beam_width) -> text`` backed by the on-device
beam search.

LM checkpoint format: the native msgpack (``save_lm_checkpoint``) or a torch
pickle with DDP-prefix conversion (``general.convert_from_ddp`` parity).
N-gram ARPA paths (``.arpa``/``.arpa.gz``) build an n-gram fusion instead.
"""

from __future__ import annotations

import dataclasses
import json
import os
import struct
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dynamic_asr_eval_tpu.lm.transformer_lm import (
    TransformerLM,
    TransformerLMConfig,
    init_lm,
)

_MAGIC = b"DLM1"


def save_lm_checkpoint(path: str, variables, config: TransformerLMConfig):
    from flax import serialization

    cfg = dataclasses.asdict(config)
    cfg["compute_dtype"] = str(jnp.dtype(config.compute_dtype).name)
    header = json.dumps(cfg).encode("utf-8")
    payload = serialization.to_bytes(variables)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<I", len(header)))
        f.write(header)
        f.write(payload)


def load_lm_checkpoint(path: str):
    from flax import serialization

    with open(path, "rb") as f:
        magic = f.read(4)
        if magic != _MAGIC:
            raise ValueError(f"{path} is not a DLM checkpoint")
        (hlen,) = struct.unpack("<I", f.read(4))
        cfg_d = json.loads(f.read(hlen).decode("utf-8"))
        payload = f.read()
    cfg_d["compute_dtype"] = jnp.dtype(cfg_d.get("compute_dtype", "float32"))
    config = TransformerLMConfig(**cfg_d)
    model, template = init_lm(config, jax.random.PRNGKey(0))
    variables = serialization.from_bytes(template, payload)
    return model, jax.tree.map(jnp.asarray, variables), config


# torch LM naming (lming-style transformer_lm checkpoints are torch pickles
# with DDP prefixes, lcasr/lib.py:44-49) → flax TransformerLM params.  Rule-
# driven like models/convert.py; value fidelity proven by the torch twin in
# tests/test_lm_oracle.py.
_LM_TORCH_RULES = [
    (r"embed\.weight", "embed/embedding", "identity"),
    (r"layers\.(\d+)\.(ln1|ln2)\.weight", r"layer_\1/\2/scale", "identity"),
    (r"layers\.(\d+)\.(ln1|ln2)\.bias", r"layer_\1/\2/bias", "identity"),
    (r"layers\.(\d+)\.(qkv|out|ff_in|ff_out)\.weight", r"layer_\1/\2/kernel", "t_dense"),
    (r"layers\.(\d+)\.(ff_in|ff_out)\.bias", r"layer_\1/\2/bias", "identity"),
    (r"ln_f\.weight", "ln_f/scale", "identity"),
    (r"ln_f\.bias", "ln_f/bias", "identity"),
    (r"head\.weight", "head/kernel", "t_dense"),
    (r"head\.bias", "head/bias", "identity"),
]


def convert_lm_torch_state(state):
    """torch LM state dict → (flax params tree, unmatched keys)."""
    from dynamic_asr_eval_tpu.models.convert import (
        convert_state_dict,
        identity,
        t_dense,
    )

    adapters = {"identity": identity, "t_dense": t_dense}
    rules = [(p, t, adapters[a]) for p, t, a in _LM_TORCH_RULES]
    return convert_state_dict(state, rules)


def load_lm_torch_checkpoint(
    path: str,
    max_cache_length: int = 128,
    compute_dtype=None,
    n_heads: Optional[int] = None,
    verbose: bool = True,
):
    """A reference torch LM checkpoint → ``(model, variables, config)``.

    Config comes from the pickled config dict where present; structural dims
    (vocab, d_model, n_layers, expansion) come from the weight shapes.  The
    head count cannot be recovered from weights (head_dim = d_model/n_heads
    here) — pass ``n_heads`` or carry it in the checkpoint config; the
    fallback assumes 64-dim heads (the 512d/8h published LM shape)."""
    import re
    import sys

    from dynamic_asr_eval_tpu.models.checkpoint import (
        _plain_config,
        load_torch_checkpoint,
    )

    state_np, raw_cfg = load_torch_checkpoint(path)
    cfg_plain = _plain_config(raw_cfg)
    cfg_d = dict(cfg_plain.get("model", cfg_plain) or {}) if isinstance(cfg_plain, dict) else {}

    emb = state_np.get("embed.weight")
    if emb is None:
        raise ValueError(f"{path}: no embed.weight — not a transformer LM "
                         "checkpoint this converter understands")
    vocab, d_model = int(emb.shape[0]), int(emb.shape[1])
    layer_ids = {int(m.group(1)) for k in state_np
                 for m in [re.match(r"layers\.(\d+)\.", k)] if m}
    n_layers = (max(layer_ids) + 1) if layer_ids else int(cfg_d.get("n_layers", 6))
    ff = state_np.get("layers.0.ff_in.weight")
    expansion = int(ff.shape[0]) // d_model if ff is not None else int(
        cfg_d.get("expansion_factor", 4))
    heads = n_heads or int(cfg_d.get("n_heads", 0))
    if not heads:
        heads = d_model // 64 if d_model % 64 == 0 else 8
        if verbose:
            import sys as _sys

            print(f"load_lm_torch_checkpoint: checkpoint config carries no "
                  f"n_heads; assuming head_dim=64 → n_heads={heads} (the "
                  f"published 512d/8h lming shape) — a wrong split changes "
                  f"rotary partitioning; pass n_heads= explicitly if this is "
                  f"wrong", file=_sys.stderr)
    config = TransformerLMConfig(
        vocab_size=vocab, n_layers=n_layers, d_model=d_model, n_heads=heads,
        max_cache_length=max_cache_length,
        rotary_base=float(cfg_d.get("rotary_base", 10_000.0)),
        expansion_factor=expansion,
        compute_dtype=compute_dtype if compute_dtype is not None else jnp.float32,
    )
    converted, unmatched = convert_lm_torch_state(state_np)
    model, template = init_lm(config, jax.random.PRNGKey(0))

    from flax.traverse_util import flatten_dict, unflatten_dict

    flat_t = flatten_dict(jax.tree.map(np.asarray, template))
    flat_c = flatten_dict({"params": converted})
    bad = [
        f"{'/'.join(k)}: checkpoint {np.shape(flat_c[k])} vs model {np.shape(flat_t[k])}"
        for k in flat_t.keys() & flat_c.keys()
        if np.shape(flat_c[k]) != np.shape(flat_t[k])
    ]
    if bad:
        raise ValueError("LM checkpoint/model shape mismatches:\n  " + "\n  ".join(bad))
    merged = dict(flat_t)
    for k in flat_t.keys() & flat_c.keys():
        merged[k] = flat_c[k]
    variables = jax.tree.map(jnp.asarray, unflatten_dict(merged))
    # attention projections are bias-free in both the lming convention and
    # this model (tests/torch_oracles.py pins it); a checkpoint that DOES
    # carry qkv/out biases cannot be represented, and silently dropping them
    # would shift every attention output — fail loudly instead of warning.
    attn_biases = [k for k in unmatched
                   if re.fullmatch(r"(module\.)?layers\.\d+\.(qkv|out)\.bias", k)]
    if attn_biases:
        raise ValueError(
            f"{path}: checkpoint has attention-projection biases "
            f"({attn_biases[:4]}…) which this bias-free LM cannot represent; "
            "conversion would silently change scores")
    if verbose:
        missing = sorted("/".join(k) for k in flat_t.keys() - flat_c.keys())
        if unmatched:
            print(f"load_lm_torch_checkpoint: {len(unmatched)} torch keys "
                  f"unconverted (first: {unmatched[:4]})", file=sys.stderr)
        if missing:
            print(f"load_lm_torch_checkpoint: {len(missing)} params kept fresh "
                  f"init (first: {missing[:4]})", file=sys.stderr)
    if compute_dtype is not None:
        variables = jax.tree.map(
            lambda a: a.astype(compute_dtype) if a.dtype == jnp.float32 else a,
            variables,
        )
    return model, variables, config


def load_lm_adapter(
    path: str,
    tokenizer,
    max_cache_length: int = 128,
    bos_id: int = 0,
    compute_dtype=None,
):
    """Build the device-beam LM adapter for a checkpoint path: ARPA n-gram
    tables for ``.arpa``/``.gz`` files, the transformer LM otherwise.  Used
    both for the final stitched decode (``load_beamsearch``) and for
    LM-fused TTA pseudo-labels (``lm_tta_beams``, lcasr/lib.py:515).

    ``compute_dtype`` overrides the checkpoint's LM compute/cache dtype
    (fused log-probs stay f32 either way); ``jnp.bfloat16`` is ~1.67× faster
    on TPU, measured token-level neutral at stitched scale."""
    from dynamic_asr_eval_tpu.ops.beam_search import (
        NGramAdapter,
        TransformerLMAdapter,
    )

    if path.endswith((".arpa", ".arpa.gz", ".gz")):
        from dynamic_asr_eval_tpu.lm.ngram import load_arpa

        token_to_id = {tokenizer.id_to_piece(i): i
                       for i in range(tokenizer.vocab_size())}
        lm = load_arpa(path, token_to_id, tokenizer.vocab_size())
        return NGramAdapter(lm, bos_id=bos_id)
    with open(path, "rb") as f:
        magic = f.read(4)
    if magic != _MAGIC:
        # reference torch pickle (lming transformer, DDP prefixes) — the
        # converter is oracle-proven in tests/test_lm_oracle.py
        model, variables, config = load_lm_torch_checkpoint(
            path, max_cache_length=max_cache_length, compute_dtype=compute_dtype)
        return TransformerLMAdapter(model, variables, config, bos_id=bos_id)
    model, variables, config = load_lm_checkpoint(path)
    # cache trimming (reference max_cache_length, lcasr/lib.py:69-71):
    # rebuild the module with the requested ring size — parameters are
    # independent of it
    config = dataclasses.replace(config, max_cache_length=max_cache_length)
    if compute_dtype is not None:
        config = dataclasses.replace(config, compute_dtype=compute_dtype)
        variables = jax.tree.map(
            lambda a: a.astype(compute_dtype)
            if a.dtype == jnp.float32 else a, variables,
        )
    model = TransformerLM(config)
    return TransformerLMAdapter(model, variables, config, bos_id=bos_id)


def load_beamsearch(
    path: str,
    tokenizer,
    alpha: float = 0.45,
    beta: float = 1.53,
    prune_less_than_val: float = 3.17,
    top_am_threshold: float = -6.0,
    max_cache_length: int = 128,
    bos_id: int = 0,
    blank_collapse_threshold: Optional[float] = 0.99,
    adapter=None,
    segment_frames: int = 4096,
    compute_dtype=None,
) -> Callable:
    """Returns ``beam_search_fn(log_probs, beam_width) -> text``.

    ``blank_collapse_threshold`` drops redundant blank-dominated frames
    before the search (one frame per blank run is kept) — measured 6× faster
    at Earnings-22 stitched scale with identical output; pass ``None`` for
    the reference's exact frame-by-frame behavior.

    ``segment_frames`` tunes the segmented decode: inputs ≤ this length keep
    the single-program path, longer ones run one reused compilation per
    segment (short-but-over-threshold recordings can raise it to avoid a
    second compile + dispatch)."""
    from dynamic_asr_eval_tpu.ops.beam_search import beam_search_device

    if adapter is None:
        adapter = load_lm_adapter(
            path, tokenizer, max_cache_length=max_cache_length, bos_id=bos_id,
            compute_dtype=compute_dtype,
        )

    def beam_search_fn(log_probs, beam_width: int = 20) -> str:
        lp = np.asarray(log_probs)
        if blank_collapse_threshold is not None:
            from dynamic_asr_eval_tpu.ops.beam_search import collapse_blank_frames

            lp = collapse_blank_frames(lp, threshold=blank_collapse_threshold)
        from dynamic_asr_eval_tpu.ops.beam_search import beam_search_segmented

        toks, lens, _ = beam_search_segmented(
            jnp.asarray(lp), adapter, segment_frames=segment_frames,
            beam_width=beam_width, alpha=alpha, beta=beta,
            top_am_threshold=top_am_threshold,
            prune_less_than_val=prune_less_than_val,
        )
        ids = [int(x) for x in np.asarray(toks[0])[: int(lens[0])]]
        return tokenizer.decode(ids)

    def from_engine_output(out, beam_width: int = 20) -> str:
        """Device-resident final decode: the engine's stitched posteriors
        are ALREADY a device array (``EngineOutput.logits``) — collapse and
        decode on chip; only token ids and two scalars cross to the host.
        Exact w.r.t. ``beam_search_fn(out.numpy_logits())``, which round-
        trips ~885 MB through host numpy + the transfer link at stitched
        scale (PERF.md round-4 LM reconciliation: those host phases, not
        the decode, were the contended-machine regression)."""
        from dynamic_asr_eval_tpu.ops.beam_search import (
            beam_search_segmented,
            collapse_blank_frames_device,
        )

        if blank_collapse_threshold is not None:
            # full padded buffer in, valid_frames masks the stitch padding —
            # keeps ONE collapse compilation per engine shape bucket
            lp_c, n_kept = collapse_blank_frames_device(
                out.logits, threshold=blank_collapse_threshold,
                valid_frames=jnp.sum(out.counts > 0))
            lp = lp_c[: int(n_kept)]
        else:
            lp = out.logits[: int(jnp.sum(out.counts > 0))]
        toks, lens, _ = beam_search_segmented(
            lp, adapter, segment_frames=segment_frames,
            beam_width=beam_width, alpha=alpha, beta=beta,
            top_am_threshold=top_am_threshold,
            prune_less_than_val=prune_less_than_val,
        )
        ids = [int(x) for x in np.asarray(toks[0])[: int(lens[0])]]
        return tokenizer.decode(ids)

    beam_search_fn.from_engine_output = from_engine_output
    return beam_search_fn


def load_beamsearch_batched(
    path: str,
    tokenizer,
    alpha: float = 0.45,
    beta: float = 1.53,
    prune_less_than_val: float = 3.17,
    top_am_threshold: float = -6.0,
    max_cache_length: int = 128,
    bos_id: int = 0,
    blank_collapse_threshold: Optional[float] = 0.99,
    adapter=None,
    segment_frames: int = 4096,
    compute_dtype=None,
    pad_streams: Optional[int] = None,
) -> Callable:
    """Multi-recording variant of :func:`load_beamsearch`: returns
    ``fn(list of [T, V+1] log-prob matrices, beam_width) -> list[str]``,
    decoding all streams in ONE device program per segment
    (:func:`ops.beam_search.beam_search_streams`).

    One recording's LM-fused decode runs beam-width-sized LM matmuls that
    leave the MXU mostly idle; batching S recordings widens every op to
    S·beam_width (per-recording results match the single-stream path to
    bf16-LM noise).  This is the final-decode analogue of the reference's
    ray CPU fan-out in ``tlm_beam.py`` — but note the round-4 bench: at
    stitched-scale emission density (~50% post-collapse) the single-stream
    path's branch skipping wins even in AGGREGATE (PERF.md round-4 item 3);
    use stream batching for sparse streams (logit-dump rescoring).

    Shapes are padded for compile reuse: time to the next ``segment_frames``
    multiple, stream count to ``pad_streams`` when given (pass the caller's
    fixed batch size so a short trailing group reuses the compilation)."""
    if adapter is None:
        adapter = load_lm_adapter(
            path, tokenizer, max_cache_length=max_cache_length, bos_id=bos_id,
            compute_dtype=compute_dtype,
        )

    def batched_fn(log_probs_list, beam_width: int = 20):
        from dynamic_asr_eval_tpu.ops.beam_search import (
            beam_search_streams,
            collapse_blank_frames,
        )

        lps = [np.asarray(lp) for lp in log_probs_list]
        if blank_collapse_threshold is not None:
            lps = [collapse_blank_frames(lp, threshold=blank_collapse_threshold)
                   for lp in lps]
        n = len(lps)
        S = max(int(pad_streams or 0), n)
        t_max = max(lp.shape[0] for lp in lps)
        t_pad = -(-t_max // segment_frames) * segment_frames
        batch = np.zeros((S, t_pad, lps[0].shape[1]), np.float32)
        # padding streams stay all-zero with valid_frames=1 — decoded (beam
        # search is defined on any scores) and discarded
        valid = np.ones((S,), np.int32)
        for s, lp in enumerate(lps):
            batch[s, : lp.shape[0]] = lp
            valid[s] = lp.shape[0]
        toks, lens, _ = beam_search_streams(
            jnp.asarray(batch), adapter, valid_frames=jnp.asarray(valid),
            segment_frames=segment_frames, beam_width=beam_width,
            alpha=alpha, beta=beta, top_am_threshold=top_am_threshold,
            prune_less_than_val=prune_less_than_val,
        )
        toks_h, lens_h = np.asarray(toks[:, 0]), np.asarray(lens[:, 0])
        return [tokenizer.decode([int(x) for x in toks_h[s][: int(lens_h[s])]])
                for s in range(n)]

    return batched_fn
