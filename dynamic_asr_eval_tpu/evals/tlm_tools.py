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
    path, lm_adapter_factory, beam_kwargs, use_device = args
    with open(path, "rb") as f:
        data = pickle.load(f)
    logits = data["logits"]
    lm = lm_adapter_factory()
    if use_device:
        import jax.numpy as jnp

        from dynamic_asr_eval_tpu.ops.beam_search import beam_search_device

        toks, lens, scores = beam_search_device(jnp.asarray(logits), lm, **beam_kwargs)
        ids = [int(x) for x in np.asarray(toks[0])[: int(lens[0])]]
    else:
        from dynamic_asr_eval_tpu.ops.beam_search import BeamSearchHost

        bs = BeamSearchHost(logits, lm, **beam_kwargs)
        ids = list(bs.run_search()[0][0])
    return data["id"], ids, data["gold"]


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
) -> Tuple[float, List[Dict]]:
    """Parallel LM-beam rescoring of dumped logits → corpus WER."""
    beam_kwargs = dict(beam_width=beam_width, alpha=alpha, beta=beta,
                       prune_less_than_val=prune_less_than_val)
    jobs = [(p, lm_adapter_factory, beam_kwargs, use_device) for p in logit_paths]
    if use_device or num_workers <= 1:
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
) -> List[Dict]:
    """Grid sweep over fusion hyperparameters (``tlm_beam_search.py``)."""
    results = []
    for a, b, p in itertools.product(alphas, betas, prunes):
        wer, _ = tlm_beam_rescore(
            logit_paths, lm_adapter_factory, tokenizer,
            beam_width=beam_width, alpha=a, beta=b, prune_less_than_val=p,
            num_workers=num_workers,
        )
        results.append({"alpha": a, "beta": b, "prune": p, "WER": wer})
        print(f"alpha={a} beta={b} prune={p} -> WER {wer:.5f}")
    return sorted(results, key=lambda r: r["WER"])
