"""Torch mini-oracle for the NSTI (dynamic_eval) loop semantics.

The only WER-parity evidence obtainable offline: re-implement the
reference's ``dynamic_eval_ctc_loss`` control flow (``lcasr/lib.py:450-640``)
in torch — chunking with the trailing-window kill rule (``:128-145``),
forward of ``[augmented, clean]`` with augmentation off, greedy pseudo-labels
from the clean stream (``:558-563``), CTC loss summed and divided by
``frames × num_negatives`` (``:573-575``), MADGRAD step, online/offline
stitching by probability-sum / count-divide then log (``:583-629``) — run it
against the JAX ``DynamicEvalEngine`` with IDENTICAL tiny weights (via the
value-proven converter, ``tests/test_conformer_oracle.py``), and assert the
adapted-parameter trajectory and the stitched logit matrix agree to fp32
tolerance over several windows and epochs.
"""

import pytest  # noqa: E402 (marker needs it first)

pytestmark = pytest.mark.slow  # torch loop-oracles (NSTI/AWMC/consistency)

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from dynamic_asr_eval_tpu.config import TTAConfig
from dynamic_asr_eval_tpu.models.conformer import ConformerConfig, SCConformer
from dynamic_asr_eval_tpu.models.convert import convert_lcasr_checkpoint
from dynamic_asr_eval_tpu.tta.runner import DynamicEvalEngine

from torch_oracles import TorchSCConformer

DS = 8
BLANK_OFFSETS_TOL = 1e-4  # params
LOGITS_TOL = 2e-3  # stitched log-probs after several optimizer steps


class TorchMadgrad:
    """MADGRAD (Defazio & Jelassi 2021) momentum dual-averaging — the
    reference's default TTA optimizer (``lcasr/lib.py:458,494``), from-paper
    torch implementation mirroring ``optim/madgrad.py``."""

    def __init__(self, params, lr, momentum=0.9, eps=1e-6):
        self.params = [p for p in params if p.requires_grad]
        self.lr, self.ck, self.eps = lr, 1.0 - momentum, eps
        self.k = 0
        self.s = [torch.zeros_like(p) for p in self.params]
        self.v = [torch.zeros_like(p) for p in self.params]
        self.x0 = [p.detach().clone() for p in self.params]

    def zero_grad(self):
        for p in self.params:
            p.grad = None

    @torch.no_grad()
    def step(self):
        lamb = self.lr * float(np.sqrt(self.k + 1))
        for p, s, v, x0 in zip(self.params, self.s, self.v, self.x0):
            if p.grad is None:
                continue
            g = p.grad
            s += lamb * g
            v += lamb * g * g
            z = x0 - s / (v.pow(1.0 / 3.0) + self.eps)
            p.mul_(1.0 - self.ck).add_(self.ck * z)
        self.k += 1


def _prepare_chunks(spec, seq_len, overlap):
    """Reference ``prepare_chunks`` (lcasr/lib.py:128-145) semantics."""
    spec_n = spec.shape[-1]
    if spec_n <= seq_len:
        return {0: spec}
    chunks, last_ulen, kill_next = {}, None, False
    for i in range(0, spec_n, seq_len - overlap):
        chunk = spec[:, :, i : i + seq_len]
        if kill_next:
            break
        if last_ulen is not None and chunk.shape[-1] < last_ulen:
            kill_next = True
        last_ulen = chunk.shape[-1]
        chunks[i] = chunk
    return chunks


def _greedy_ids(lp, blank):
    ids, out, prev = lp.argmax(-1).tolist(), [], -1
    for t in ids:
        if t != prev and t != blank:
            out.append(t)
        prev = t
    return out


def torch_dynamic_eval(model, spec, seq_len, overlap, lr, epochs, online):
    """Reference ``dynamic_eval_ctc_loss`` control flow with augmentation off
    (num_negatives=1, all aug no-op — the aug copy equals the clean copy)."""
    blank = model.decoder.num_classes - 1
    spec_n = spec.shape[-1]
    V = model.decoder.num_classes
    if seq_len > spec_n:
        seq_len, overlap = spec_n, 0
    ctc_loss_fn = torch.nn.CTCLoss(blank=blank, reduction="sum")
    optimizer = TorchMadgrad(model.parameters(), lr=lr)
    model.eval()
    epochs = 1 if online else epochs
    model_outputs = {}
    chunks = _prepare_chunks(spec, seq_len, overlap)
    for _epoch in range(epochs):
        for i, chunk in chunks.items():
            audio = chunk.repeat(2, 1, 1)  # [aug, clean], aug is a no-op copy
            u_len = audio.shape[-1]
            out = model(audio_signal=audio)["final_posteriors"]
            pseudo = _greedy_ids(out[-1].detach(), blank)
            targets = torch.LongTensor(pseudo).unsqueeze(0)
            aug_outs = out[:1]
            N, B = aug_outs.shape[1], aug_outs.shape[0]
            loss = ctc_loss_fn(
                aug_outs.transpose(0, 1), targets,
                torch.LongTensor([N]), torch.LongTensor([targets.shape[1]]),
            ) / (N * B)
            optimizer.zero_grad()
            loss.backward()
            optimizer.step()
            if online:
                logits = out[-1].detach().exp()
                ds_len = logits.shape[-2]
                model_outputs[i] = (logits, ds_len, int(overlap / (u_len / ds_len)))
    if not online:
        for i, chunk in chunks.items():
            u_len = chunk.shape[-1]
            with torch.no_grad():
                out = model(audio_signal=chunk)["final_posteriors"]
            logits = out[0].exp()
            ds_len = logits.shape[-2]
            model_outputs[i] = (logits, ds_len, int(overlap / (u_len / ds_len)))

    all_logits = torch.zeros(spec_n // DS + seq_len, V)
    counts = torch.zeros(spec_n // DS + seq_len)
    pos = 0
    for j, i in enumerate(sorted(model_outputs.keys())):
        logits, ds_len, overlap_ds = model_outputs[i]
        pos -= overlap_ds if j != 0 else 0
        all_logits[pos : pos + ds_len] += logits
        counts[pos : pos + ds_len] += 1
        pos += ds_len
    keep = counts > 0
    stitched = torch.log(all_logits[keep] / counts[keep, None])
    return stitched.numpy(), model


def _setup(seed=0):
    dims = dict(feat_in=16, n_layers=2, d_model=32, n_heads=2, head_dim=16,
                vocab_size=32, subsampling_factor=DS,
                subsampling_conv_channels=8, conv_kernel_size=9)
    torch.manual_seed(seed)
    tm = TorchSCConformer(**dims).eval()
    cfg = ConformerConfig(compute_dtype=jnp.float32, **dims)
    variables, unmatched = convert_lcasr_checkpoint(
        {k: v.detach().numpy() for k, v in tm.state_dict().items()},
        cfg.default_norm,
    )
    assert unmatched == []
    return tm, cfg, variables


def _run_jax(cfg, variables, spec_np, seq_len, overlap, lr, epochs, online):
    tta = TTAConfig(seq_len=seq_len, overlap=overlap, epochs=epochs,
                    online=online, shuffle=False, lm_tta_beams=0,
                    optim_args={"lr": lr})
    engine = DynamicEvalEngine(
        SCConformer(cfg), cfg.blank_id, cfg.subsampling_factor, tta,
    )
    out = engine(variables, spec_np, seq_len, overlap, return_params=True)
    return out.numpy_logits(), out.params


def _param_delta(torch_model, jax_params, default_norm="layer_norm"):
    adapted_vars, _ = convert_lcasr_checkpoint(
        {k: v.detach().numpy() for k, v in torch_model.state_dict().items()},
        default_norm,
    )
    deltas = jax.tree.map(
        lambda a, b: float(jnp.abs(a - jnp.asarray(b)).max()),
        jax_params, adapted_vars["params"],
    )
    return max(jax.tree.leaves(deltas))


@pytest.mark.parametrize("online", [True, False])
def test_nsti_loop_parity_single_epoch(online):
    """5-window recording (incl. a short tail window), one adaptation epoch:
    the adapted parameters and the stitched logit matrix must match the torch
    reference control flow to fp32 tolerance."""
    tm, cfg, variables = _setup(seed=0)
    lr = 1e-3
    spec = np.random.default_rng(0).standard_normal((16, 160)).astype(np.float32)

    j_logits, j_params = _run_jax(cfg, variables, spec, 64, 32, lr, 1, online)
    t_logits, tm = torch_dynamic_eval(
        tm, torch.from_numpy(spec)[None], 64, 32, lr, 1, online)

    assert j_logits.shape == t_logits.shape, (j_logits.shape, t_logits.shape)
    assert np.abs(j_logits - t_logits).max() < LOGITS_TOL, \
        np.abs(j_logits - t_logits).max()
    # the run must have actually adapted (guards a no-op engine)
    base = variables["params"]
    moved = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), base, j_params)))
    assert moved > 1e-6, "adaptation did not change parameters"
    assert _param_delta(tm, j_params) < BLANK_OFFSETS_TOL


def test_nsti_loop_parity_two_epochs_offline():
    """Two offline epochs + fresh final pass (lcasr/lib.py:596-612)."""
    tm, cfg, variables = _setup(seed=1)
    lr = 5e-4
    spec = np.random.default_rng(1).standard_normal((16, 160)).astype(np.float32)

    j_logits, j_params = _run_jax(cfg, variables, spec, 64, 32, lr, 2, False)
    t_logits, tm = torch_dynamic_eval(
        tm, torch.from_numpy(spec)[None], 64, 32, lr, 2, False)

    assert j_logits.shape == t_logits.shape
    assert np.abs(j_logits - t_logits).max() < LOGITS_TOL, \
        np.abs(j_logits - t_logits).max()
    assert _param_delta(tm, j_params) < BLANK_OFFSETS_TOL


def test_nsti_ragged_tail_window():
    """Tail window whose length is NOT a multiple of the subsampling factor
    (150 frames, 64/32 windows → 22-frame tail): regression for the
    inter-stage subsampling leak — without per-stage length masking the
    padded tail's boundary frames read values an unpadded run would have as
    conv zero-padding, so the stitched tail diverged from the reference."""
    tm, cfg, variables = _setup(seed=6)
    lr = 1e-3
    spec = np.random.default_rng(6).standard_normal((16, 150)).astype(np.float32)

    j_logits, _ = _run_jax(cfg, variables, spec, 64, 32, lr, 1, True)
    t_logits, _ = torch_dynamic_eval(
        tm, torch.from_numpy(spec)[None], 64, 32, lr, 1, True)

    assert j_logits.shape == t_logits.shape, (j_logits.shape, t_logits.shape)
    assert np.abs(j_logits - t_logits).max() < LOGITS_TOL, \
        np.abs(j_logits - t_logits).max()


def test_nsti_single_window_recording():
    """spec shorter than seq_len: one full-length window, overlap forced 0
    (lcasr/lib.py:501-503)."""
    tm, cfg, variables = _setup(seed=2)
    lr = 1e-3
    spec = np.random.default_rng(2).standard_normal((16, 48)).astype(np.float32)

    j_logits, _ = _run_jax(cfg, variables, spec, 64, 32, lr, 1, True)
    t_logits, _ = torch_dynamic_eval(
        tm, torch.from_numpy(spec)[None], 64, 32, lr, 1, True)

    assert j_logits.shape == t_logits.shape, (j_logits.shape, t_logits.shape)
    assert np.abs(j_logits - t_logits).max() < LOGITS_TOL


# ---------------------------------------------------------------------------
# AWMC mini-oracle (lcasr/lib.py:206-376): anchor/leader EMA pseudo-label
# banks, inner per-chunk epoch loop, dual-bank CTC normalized by N·B·2.
# ---------------------------------------------------------------------------


def torch_awmc(model, spec, seq_len, overlap, lr, epochs, ema_decay):
    """Reference ``AWMC`` control flow with augmentation off.

    Per chunk (``lcasr/lib.py:281-349``): epoch 0 decodes pseudo-labels with
    the *anchor* (EMA decay 1.0 — the original weights, ``:248``) and keeps
    them for every inner epoch; each epoch decodes with the *leader* EMA
    (decay ``ema_decay``, ``:245``); the student forwards the (here:
    un-augmented) chunk and takes a summed CTC loss against both banks
    divided by ``frames × batch × 2`` (``:322-330``); MADGRAD step, then the
    leader EMA updates (``:335-337``); after the last epoch a clean no-grad
    forward with the adapted weights is stitched (``:339-349``).

    The leader EMA follows torch_ema's default ``use_num_updates=True``
    schedule (the reference's actual dependency, ``lcasr/lib.py:26,245``):
    the n-th ``update()`` uses ``min(ema_decay, (1+n)/(10+n))``, and the
    counter starts at 1 because of the construction-time update
    (``:246``) — pinned against the reference source itself by
    ``tests/test_reference_source_loop_oracle.py``.
    """
    blank = model.decoder.num_classes - 1
    V = model.decoder.num_classes
    spec_n = spec.shape[-1]
    if seq_len > spec_n:
        seq_len, overlap = spec_n, 0
    ctc_loss_fn = torch.nn.CTCLoss(blank=blank, reduction="sum")
    optimizer = TorchMadgrad(model.parameters(), lr=lr)
    model.eval()
    anchor = [p.detach().clone() for p in model.parameters()]
    leader = [p.detach().clone() for p in model.parameters()]
    n_upd = 1  # construction-time leader update (lcasr/lib.py:246)

    def decode_with(weights, chunk):
        backup = [p.detach().clone() for p in model.parameters()]
        with torch.no_grad():
            for p, q in zip(model.parameters(), weights):
                p.copy_(q)
            lp = model(audio_signal=chunk)["final_posteriors"]
            for p, b in zip(model.parameters(), backup):
                p.copy_(b)
        return _greedy_ids(lp[-1], blank)

    model_outputs = {}
    for i, chunk in _prepare_chunks(spec, seq_len, overlap).items():
        bank = [None, None]
        for j in range(epochs):
            if j == 0:
                bank[0] = decode_with(anchor, chunk)
            bank[1] = decode_with(leader, chunk)
            out = model(audio_signal=chunk)["final_posteriors"]  # student fwd
            labels = [b for b in bank if len(b) > 0]
            assert labels, "oracle fixture hit the empty-bank edge; reseed"
            N, B = out.shape[1], out.shape[0]
            lab_lens = torch.LongTensor([len(b) for b in labels])
            padded = torch.zeros(len(labels), int(lab_lens.max()), dtype=torch.long)
            for r, b in enumerate(labels):
                padded[r, : len(b)] = torch.LongTensor(b)
            loss = ctc_loss_fn(
                out.repeat(len(labels), 1, 1).transpose(0, 1), padded,
                torch.LongTensor([N] * len(labels)), lab_lens,
            ) / (N * B * 2)
            optimizer.zero_grad()
            loss.backward()
            optimizer.step()
            n_upd += 1
            d_t = min(ema_decay, (1 + n_upd) / (10 + n_upd))
            with torch.no_grad():
                for e, p in zip(leader, model.parameters()):
                    e.mul_(d_t).add_((1.0 - d_t) * p)
            if j == epochs - 1:
                with torch.no_grad():
                    fin = model(audio_signal=chunk)["final_posteriors"]
                logits = fin[0].exp()
                ds_len = logits.shape[-2]
                model_outputs[i] = (
                    logits, ds_len, int(overlap / (chunk.shape[-1] / ds_len))
                )

    all_logits = torch.zeros(spec_n // DS + seq_len, V)
    counts = torch.zeros(spec_n // DS + seq_len)
    pos = 0
    for j, i in enumerate(sorted(model_outputs.keys())):
        logits, ds_len, overlap_ds = model_outputs[i]
        pos -= overlap_ds if j != 0 else 0
        all_logits[pos : pos + ds_len] += logits
        counts[pos : pos + ds_len] += 1
        pos += ds_len
    keep = counts > 0
    stitched = torch.log(all_logits[keep] / counts[keep, None])
    return stitched.numpy(), model


def _run_jax_awmc(cfg, variables, spec_np, seq_len, overlap, lr, epochs,
                  ema_decay):
    from dynamic_asr_eval_tpu.tta.awmc import AWMCEngine

    tta = TTAConfig(seq_len=seq_len, overlap=overlap, epochs=epochs,
                    online=True, shuffle=False, lm_tta_beams=0,
                    ema_decay=ema_decay, optim_args={"lr": lr})
    engine = AWMCEngine(
        SCConformer(cfg), cfg.blank_id, cfg.subsampling_factor, tta,
    )
    out = engine(variables, spec_np, seq_len, overlap, return_params=True)
    return out.numpy_logits(), out.params


# ---------------------------------------------------------------------------
# Consistency mini-oracle (lcasr/lib.py:646-903): per-chunk parameter
# collections, sequential in-place distance-decay gradient sharing, per-chunk
# optimizer steps after each epoch.
# ---------------------------------------------------------------------------


def torch_consistency(model, spec, seq_len, overlap, lr, epochs, online):
    """Reference ``dynamic_eval_consistency_ctc_loss`` control flow with
    augmentation off and MADGRAD injected as the per-chunk optimizer (the
    reference's Adafactor default is an optimizer *choice*, ``:654``; the
    oracle pins both sides to the already-validated MADGRAD so it tests the
    consistency CONTROL FLOW: per-chunk params/optimizers ``:733-737``,
    grads stored not applied ``:795-805``, sequential in-place fp64 mixing
    ``:817-848``, per-chunk steps ``:850-853``).

    Two reference quirks reproduced/diverged deliberately:
    - online mode does NOT clamp the epoch loop (``:742`` re-reads
      ``args.epochs``, ignoring the ``epochs = 1 if online`` local) — each
      epoch overwrites ``model_outputs`` so the stitch uses the last epoch;
    - the offline final pass's parameter install is a no-op in the reference
      (``p_cur.data.to(...)`` unassigned, ``:858``) so it accidentally reuses
      the last-trained chunk's live weights; like the engine we implement the
      evident intent — each chunk evaluated with its own adapted parameters.
    """
    blank = model.decoder.num_classes - 1
    V = model.decoder.num_classes
    spec_n = spec.shape[-1]
    if seq_len > spec_n:
        seq_len, overlap = spec_n, 0
    ctc_loss_fn = torch.nn.CTCLoss(blank=blank, reduction="sum")
    model.eval()
    chunks = _prepare_chunks(spec, seq_len, overlap)
    keys = sorted(chunks.keys())
    collections = {
        k: [p.detach().clone().requires_grad_(True) for p in model.parameters()]
        for k in keys
    }
    optimizers = {k: TorchMadgrad(collections[k], lr=lr) for k in keys}

    model_outputs = {}
    for _epoch in range(epochs):
        for i in keys:
            chunk = chunks[i]
            with torch.no_grad():
                for p, q in zip(model.parameters(), collections[i]):
                    p.copy_(q)
            audio = chunk.repeat(2, 1, 1)  # [aug(no-op), clean]
            u_len = audio.shape[-1]
            out = model(audio_signal=audio)["final_posteriors"]
            pseudo = _greedy_ids(out[-1].detach(), blank)
            targets = torch.LongTensor(pseudo).unsqueeze(0)
            aug_outs = out[:1]
            N, B = aug_outs.shape[1], aug_outs.shape[0]
            loss = ctc_loss_fn(
                aug_outs.transpose(0, 1), targets,
                torch.LongTensor([N]), torch.LongTensor([targets.shape[1]]),
            ) / (N * B)
            model.zero_grad()
            loss.backward()
            with torch.no_grad():
                for p, q in zip(model.parameters(), collections[i]):
                    q.grad = p.grad.detach().clone() if p.grad is not None else None
            model.zero_grad()
            if online:
                logits = out[-1].detach().exp()
                ds_len = logits.shape[-2]
                model_outputs[i] = (
                    logits, ds_len, int(overlap / (u_len / ds_len))
                )
        # sequential in-place mixing, ascending chunk order, fp64 (:817-848)
        with torch.no_grad():
            for ii, key_i in enumerate(keys):
                for z, param in enumerate(collections[key_i]):
                    if param.grad is None:
                        continue
                    cur = param.grad.clone().to(torch.float64)
                    total = 1.0
                    for qq, key_q in enumerate(keys):
                        if key_i == key_q:
                            continue
                        d = 0.95 ** abs(ii - qq)
                        total += d
                        qg = collections[key_q][z].grad
                        if qg is not None:
                            cur += (d * qg.clone()).to(torch.float64)
                    param.grad.data = (cur / total).to(torch.float32)
        for k in keys:
            optimizers[k].step()
            optimizers[k].zero_grad()

    if not online:
        for i in keys:
            chunk = chunks[i]
            with torch.no_grad():
                for p, q in zip(model.parameters(), collections[i]):
                    p.copy_(q)
                out = model(audio_signal=chunk)["final_posteriors"]
            logits = out[0].exp()
            ds_len = logits.shape[-2]
            model_outputs[i] = (
                logits, ds_len, int(overlap / (chunk.shape[-1] / ds_len))
            )

    all_logits = torch.zeros(spec_n // DS + seq_len, V)
    counts = torch.zeros(spec_n // DS + seq_len)
    pos = 0
    for j, i in enumerate(sorted(model_outputs.keys())):
        logits, ds_len, overlap_ds = model_outputs[i]
        pos -= overlap_ds if j != 0 else 0
        all_logits[pos : pos + ds_len] += logits
        counts[pos : pos + ds_len] += 1
        pos += ds_len
    keep = counts > 0
    stitched = torch.log(all_logits[keep] / counts[keep, None])
    return stitched.numpy(), collections, keys


def _run_jax_consistency(cfg, variables, spec_np, seq_len, overlap, lr,
                         epochs, online):
    from dynamic_asr_eval_tpu.optim.madgrad import madgrad
    from dynamic_asr_eval_tpu.tta.consistency import ConsistencyEngine

    tta = TTAConfig(seq_len=seq_len, overlap=overlap, epochs=epochs,
                    online=online, shuffle=False, lm_tta_beams=0,
                    optim_args={"lr": lr})
    engine = ConsistencyEngine(
        SCConformer(cfg), cfg.blank_id, cfg.subsampling_factor, tta,
        optimizer=madgrad(lr),
    )
    out = engine(variables, spec_np, seq_len, overlap, return_params=True)
    return out.numpy_logits(), out.params


@pytest.mark.parametrize("online,epochs", [(True, 1), (False, 2)])
def test_consistency_loop_parity(online, epochs):
    """5-window recording: per-chunk adapted parameters and the stitched
    logit matrix must match the torch reference control flow.  epochs=2
    offline exercises repeated mixing+stepping and the per-chunk final
    pass."""
    tm, cfg, variables = _setup(seed=4)
    lr = 1e-3
    spec = np.random.default_rng(4).standard_normal((16, 160)).astype(np.float32)

    j_logits, j_stacked = _run_jax_consistency(
        cfg, variables, spec, 64, 32, lr, epochs, online)
    t_logits, t_collections, t_keys = torch_consistency(
        tm, torch.from_numpy(spec)[None], 64, 32, lr, epochs, online)

    assert j_logits.shape == t_logits.shape, (j_logits.shape, t_logits.shape)
    assert np.abs(j_logits - t_logits).max() < LOGITS_TOL, \
        np.abs(j_logits - t_logits).max()

    # per-chunk adapted parameters: install each torch collection into the
    # model, convert, and compare against the stacked pytree's chunk slice
    names = [n for n, _ in tm.named_parameters()]
    for ci, k in enumerate(t_keys):
        sd = {kk: v.detach().numpy() for kk, v in tm.state_dict().items()}
        for n, q in zip(names, t_collections[k]):
            sd[n] = q.detach().numpy()
        chunk_vars, unmatched = convert_lcasr_checkpoint(sd, cfg.default_norm)
        assert unmatched == []
        j_chunk = jax.tree.map(lambda s: s[ci], j_stacked)
        delta = max(jax.tree.leaves(jax.tree.map(
            lambda a, b: float(jnp.abs(a - jnp.asarray(b)).max()),
            j_chunk, chunk_vars["params"],
        )))
        assert delta < BLANK_OFFSETS_TOL, (ci, delta)


def test_consistency_ragged_tail_window():
    """Consistency engine with a non-factor-multiple tail window (150 frames
    → 54-frame tail): regression for the inter-stage subsampling leak in the
    per-chunk-params + mixing setting."""
    tm, cfg, variables = _setup(seed=7)
    lr = 1e-3
    spec = np.random.default_rng(7).standard_normal((16, 150)).astype(np.float32)

    j_logits, _ = _run_jax_consistency(cfg, variables, spec, 64, 32, lr, 1, True)
    t_logits, _, _ = torch_consistency(
        tm, torch.from_numpy(spec)[None], 64, 32, lr, 1, True)

    assert j_logits.shape == t_logits.shape, (j_logits.shape, t_logits.shape)
    assert np.abs(j_logits - t_logits).max() < LOGITS_TOL, \
        np.abs(j_logits - t_logits).max()


def test_awmc_ragged_tail_window():
    """AWMC with a non-factor-multiple tail window (150 frames → 54-frame
    tail): regression for the inter-stage subsampling leak in the dual-bank
    EMA setting."""
    tm, cfg, variables = _setup(seed=8)
    lr, ema_decay = 1e-3, 0.9
    spec = np.random.default_rng(8).standard_normal((16, 150)).astype(np.float32)

    j_logits, _ = _run_jax_awmc(cfg, variables, spec, 64, 32, lr, 1, ema_decay)
    t_logits, _ = torch_awmc(
        tm, torch.from_numpy(spec)[None], 64, 32, lr, 1, ema_decay)

    assert j_logits.shape == t_logits.shape, (j_logits.shape, t_logits.shape)
    assert np.abs(j_logits - t_logits).max() < LOGITS_TOL, \
        np.abs(j_logits - t_logits).max()


@pytest.mark.parametrize("epochs", [1, 2])
def test_awmc_loop_parity(epochs):
    """5-window recording: the AWMC-adapted parameters and stitched logit
    matrix must match the torch reference control flow to fp32 tolerance.
    epochs=2 exercises the inner per-chunk epoch loop — the anchor bank
    persisting across epochs while the leader bank refreshes."""
    tm, cfg, variables = _setup(seed=3)
    lr, ema_decay = 1e-3, 0.9
    spec = np.random.default_rng(3).standard_normal((16, 160)).astype(np.float32)

    j_logits, j_params = _run_jax_awmc(
        cfg, variables, spec, 64, 32, lr, epochs, ema_decay)
    t_logits, tm = torch_awmc(
        tm, torch.from_numpy(spec)[None], 64, 32, lr, epochs, ema_decay)

    assert j_logits.shape == t_logits.shape, (j_logits.shape, t_logits.shape)
    assert np.abs(j_logits - t_logits).max() < LOGITS_TOL, \
        np.abs(j_logits - t_logits).max()
    base = variables["params"]
    moved = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), base, j_params)))
    assert moved > 1e-6, "AWMC did not change parameters"
    assert _param_delta(tm, j_params) < BLANK_OFFSETS_TOL
