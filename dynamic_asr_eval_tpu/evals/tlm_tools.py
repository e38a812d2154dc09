"""Transformer-LM rescoring tools.

Capability parity with ``lcasr/tedlium/bin/{create_logits,tlm_beam}.py``
(duplicated under ``lcasr_nemo/``; ~800 LoC):

- :func:`create_logits` — windowed inference per recording, dumping each
  stitched logit matrix + gold text to a pickle directory
  (``create_logits.py`` behavior);
- :func:`tlm_beam_rescore` — LM-fused beam search over the dumped logits,
  fanned out across a worker pool (the reference uses ``@ray.remote`` CPU
  workers, ``tlm_beam.py:54-68``; here a ``concurrent.futures`` pool — the
  same embarrassing parallelism without the ray dependency);
- :func:`lm_init_state_from_text` — warm-starting the LM KV cache from a
  long "init sequence" prompt with cache sliding (``get_init_seq``,
  ``tlm_beam.py:70-104``) — with the ring-buffer cache, prefill IS the
  sliding window;
- :func:`tlm_beam_grid` — the α/β/prune grid-sweep variant
  (``tlm_beam_search.py``).
"""

from __future__ import annotations

import itertools
import os
import pickle
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from dynamic_asr_eval_tpu.text import normalize, word_error_rate_detail


def create_logits(
    engine,
    variables,
    records: Sequence[Dict],
    out_dir: str,
    seq_len: int,
    overlap: int,
):
    """Dump per-recording stitched logits + gold text."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for rec in records:
        spec, gold = rec["process_fn"](rec)
        out = engine(variables, spec, seq_len, overlap)
        path = os.path.join(out_dir, f"{os.path.basename(str(rec['id']))}.pkl")
        with open(path, "wb") as f:
            pickle.dump({"logits": out.numpy_logits(), "gold": gold,
                         "id": rec["id"]}, f)
        paths.append(path)
    return paths


def lm_init_state_from_text(model, variables, config, tokenizer, text: str,
                            batch: int = 1):
    """Prefill the LM cache with a text prompt (teacher-context warm start).
    The fixed-size ring buffer keeps exactly the last ``max_cache_length``
    tokens — the reference's ``cache[-cache_len:]`` slide comes for free."""
    import jax.numpy as jnp

    from dynamic_asr_eval_tpu.lm.transformer_lm import empty_cache

    ids = tokenizer.encode(text)
    cache = empty_cache(config, batch)
    lps = None
    for t in [0] + list(ids):  # BOS then prompt
        lps, cache = model.apply(variables, jnp.full((batch,), t, jnp.int32), cache)
    return cache, lps


def _rescore_one(args):
    path, lm_adapter_factory, beam_kwargs = args
    with open(path, "rb") as f:
        data = pickle.load(f)
    logits = data["logits"]
    lm = lm_adapter_factory()
    from dynamic_asr_eval_tpu.ops.beam_search import BeamSearchHost

    bs = BeamSearchHost(logits, lm, **beam_kwargs)
    ids = list(bs.run_search()[0][0])
    return data["id"], ids, data["gold"]


def _rescore_streams(
    logit_paths, lm_adapter_factory, beam_kwargs, stream_batch,
    blank_collapse_threshold, segment_frames,
):
    """Device-batched rescoring: S recordings per dispatch through
    :func:`ops.beam_search.beam_search_streams` (one batched LM forward
    serves every stream — the TPU replacement for the reference's ray
    CPU-worker fan-out, ``tlm_beam.py:54-68``).  Short final groups are
    padded with zero-length streams (decoded as empty, dropped)."""
    import jax.numpy as jnp

    from dynamic_asr_eval_tpu.ops.beam_search import (
        beam_search_streams,
        collapse_blank_frames,
    )

    lm = lm_adapter_factory()
    results = []
    for i in range(0, len(logit_paths), stream_batch):
        datas = []
        for p in logit_paths[i : i + stream_batch]:
            with open(p, "rb") as f:
                datas.append(pickle.load(f))
        lps = [np.asarray(d["logits"]) for d in datas]
        if blank_collapse_threshold is not None:
            lps = [collapse_blank_frames(lp, threshold=blank_collapse_threshold)
                   for lp in lps]
        lens = [lp.shape[0] for lp in lps]
        T = max(lens)
        if T > segment_frames:  # stabilize compile shapes across groups
            T = -(-T // segment_frames) * segment_frames
        batch = np.stack(
            [np.pad(lp, ((0, T - lp.shape[0]), (0, 0))) for lp in lps]
            + [np.zeros((T, lps[0].shape[1]), np.float32)]
            * (stream_batch - len(lps))
        )
        toks, lns, _ = beam_search_streams(
            jnp.asarray(batch), lm,
            valid_frames=jnp.asarray(lens + [0] * (stream_batch - len(lens))),
            segment_frames=segment_frames, **beam_kwargs,
        )
        for s, d in enumerate(datas):
            ids = [int(x) for x in np.asarray(toks[s, 0])[: int(lns[s, 0])]]
            results.append((d["id"], ids, d["gold"]))
    return results


def tlm_beam_rescore(
    logit_paths: Sequence[str],
    lm_adapter_factory,
    tokenizer,
    beam_width: int = 25,
    alpha: float = 0.45,
    beta: float = 1.53,
    prune_less_than_val: Optional[float] = 3.17,
    num_workers: int = 4,
    use_device: bool = False,
    stream_batch: int = 1,
    blank_collapse_threshold: Optional[float] = None,
    segment_frames: int = 4096,
) -> Tuple[float, List[Dict]]:
    """Parallel LM-beam rescoring of dumped logits → corpus WER.

    ``use_device`` decodes on device via :func:`beam_search_streams` —
    ``stream_batch`` recordings per dispatch, every stream getting the same
    blank collapse + frame segmentation regardless of the batch setting, so
    ``stream_batch`` changes throughput but never results.  Host path
    (``use_device=False``) fans out over a thread pool, the stand-in for the
    reference's ray CPU workers."""
    beam_kwargs = dict(beam_width=beam_width, alpha=alpha, beta=beta,
                       prune_less_than_val=prune_less_than_val)
    if use_device:
        results = _rescore_streams(
            logit_paths, lm_adapter_factory, beam_kwargs, max(1, stream_batch),
            blank_collapse_threshold, segment_frames,
        )
    else:
        jobs = [(p, lm_adapter_factory, beam_kwargs) for p in logit_paths]
        if num_workers <= 1:
            results = [_rescore_one(j) for j in jobs]
        else:
            with ThreadPoolExecutor(max_workers=num_workers) as pool:
                results = list(pool.map(_rescore_one, jobs))
    hyps, refs, detail = [], [], []
    for rid, ids, gold in results:
        text = normalize(tokenizer.decode(ids))
        hyps.append(text)
        refs.append(gold)
        detail.append({"id": rid, "hyp": text, "gold": gold})
    wer = word_error_rate_detail(hyps, refs)[0]
    return wer, detail


def tlm_beam_grid(
    logit_paths: Sequence[str],
    lm_adapter_factory,
    tokenizer,
    alphas: Sequence[float] = (0.2, 0.45),
    betas: Sequence[float] = (0.8, 1.53),
    prunes: Sequence[float] = (1.5, 3.17),
    beam_width: int = 25,
    num_workers: int = 4,
    use_device: bool = False,
    stream_batch: int = 1,
    blank_collapse_threshold: Optional[float] = None,
    segment_frames: int = 4096,
) -> List[Dict]:
    """Grid sweep over fusion hyperparameters (``tlm_beam_search.py``).
    Each grid point runs through :func:`tlm_beam_rescore` with the same
    decode-path knobs, so grid and rescore numbers are directly comparable."""
    results = []
    for a, b, p in itertools.product(alphas, betas, prunes):
        wer, _ = tlm_beam_rescore(
            logit_paths, lm_adapter_factory, tokenizer,
            beam_width=beam_width, alpha=a, beta=b, prune_less_than_val=p,
            num_workers=num_workers, use_device=use_device,
            stream_batch=stream_batch,
            blank_collapse_threshold=blank_collapse_threshold,
            segment_frames=segment_frames,
        )
        results.append({"alpha": a, "beta": b, "prune": p, "WER": wer})
        print(f"alpha={a} beta={b} prune={p} -> WER {wer:.5f}")
    return sorted(results, key=lambda r: r["WER"])


def _cli():
    """CLI parity with the reference's ``bin/create_logits.py`` (subcommand
    ``dump``) and ``bin/tlm_beam.py`` / ``tlm_beam_search.py`` (``rescore`` /
    ``grid``), with the same flag names where they exist."""
    import argparse
    import glob

    import jax

    from dynamic_asr_eval_tpu.config import TTAConfig
    from dynamic_asr_eval_tpu.data import get_dataset
    from dynamic_asr_eval_tpu.lm.loader import load_lm_adapter
    from dynamic_asr_eval_tpu.text import load_tokenizer
    from dynamic_asr_eval_tpu.tta import DynamicEvalEngine

    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("dump", help="windowed inference → per-recording logit pickles")
    d.add_argument("-c", "--checkpoint", default="")
    d.add_argument("-d", "--dataset", default="synthetic")
    d.add_argument("-split", "--split", default="test")
    d.add_argument("-seq", "--seq_len", type=int, default=16384)
    d.add_argument("-overlap", "--overlap", type=int, default=0)
    d.add_argument("-s", "--save_path", default="./logits")
    d.add_argument("--tokenizer", default="")

    for name in ("rescore", "grid"):
        r = sub.add_parser(name)
        r.add_argument("-logits", "--logits_path", required=True,
                       help="logit-pickle directory or glob")
        r.add_argument("-lm", "--lm_checkpoint", required=True)
        r.add_argument("-beams", "--beam_width", type=int, default=25)
        # grid sweeps every combination of the (repeatable) values; rescore
        # uses exactly one of each
        nargs = "+" if name == "grid" else None
        r.add_argument("-alpha", "--alpha", type=float, nargs=nargs,
                       default=[0.2, 0.45] if name == "grid" else 0.45)
        r.add_argument("-beta", "--beta", type=float, nargs=nargs,
                       default=[0.8, 1.53] if name == "grid" else 1.53)
        r.add_argument("-p", "--p", type=float, nargs=nargs,
                       default=[1.5, 3.17] if name == "grid" else 3.17)
        r.add_argument("--stream_batch", type=int, default=1,
                       help=">1 decodes that many recordings per device dispatch")
        r.add_argument("--blank_collapse", type=float, default=0.99)
        r.add_argument("--tokenizer", default="")
    args = parser.parse_args()

    tokenizer = load_tokenizer(getattr(args, "tokenizer", "") or None)
    if args.cmd == "dump":
        from dynamic_asr_eval_tpu.evals.common import load_model_and_tokenizer

        model, variables, tokenizer, cfg = load_model_and_tokenizer(args)
        engine = DynamicEvalEngine(
            model, cfg.blank_id, cfg.subsampling_factor,
            TTAConfig(seq_len=args.seq_len,
                      overlap=args.overlap, epochs=0, shuffle=False),
        )
        records = get_dataset(args.dataset, args.split)

        def run(v, spec, seq, ov):
            return engine(v, spec)

        paths = create_logits(run, variables, records, args.save_path,
                              args.seq_len, args.overlap)
        print(f"dumped {len(paths)} logit pickles to {args.save_path}")
        return

    paths = sorted(glob.glob(os.path.join(args.logits_path, "*.pkl"))
                   if os.path.isdir(args.logits_path)
                   else glob.glob(args.logits_path))
    if not paths:
        raise SystemExit(f"no logit pickles at {args.logits_path}")
    factory = lambda: load_lm_adapter(args.lm_checkpoint, tokenizer)  # noqa: E731
    if args.cmd == "rescore":
        wer, _ = tlm_beam_rescore(
            paths, factory, tokenizer, beam_width=args.beam_width,
            alpha=args.alpha, beta=args.beta, prune_less_than_val=args.p,
            use_device=True, stream_batch=args.stream_batch,
            blank_collapse_threshold=args.blank_collapse,
        )
        print(f"WER: {wer:.5f}")
    else:
        tlm_beam_grid(paths, factory, tokenizer, beam_width=args.beam_width,
                      alphas=args.alpha, betas=args.beta, prunes=args.p,
                      num_workers=1, use_device=True,
                      stream_batch=args.stream_batch,
                      blank_collapse_threshold=args.blank_collapse)


if __name__ == "__main__":
    _cli()
