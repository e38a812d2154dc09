"""Encoder-decoder TTA with RL (GRPO / MaxRL) or teacher-CE updates.

Capability parity with ``enc_dec_dynamic_eval`` (``lcasr/lib.py:1475-1732``):

per chunk (no overlap — reference asserts overlap==0, ``:1549``):
  1. teacher greedy decode of the *clean* copy (AR, on device);
  2. optional teacher-forced pass for confidence/entropy and CTC-branch text,
     optional second sampled decode — all feeding the teacher filters
     (``tta.filters``); filtered chunks are skipped (``:1615-1627``);
  3. update:
     - ``teacher_ce``: joint CTC+CE supervised step on the augmented copy
       against the teacher transcript (``calc_loss_enc_dec``,
       ``lcasr/lib.py:1228-1322``);
     - ``grpo`` / ``maxrl``: sample 4 rollouts from the augmented copy,
       reward = mean(1−WER, 1−CER, BLEU) vs the teacher (``calc_rewards``,
       ``:1330-1359``; skip if mean reward > 0.95 or degenerate), policy
       gradient with group-mean advantage (GRPO, ``:1400-1422``) or
       binarized pass-rate advantage (MaxRL, ``:1425-1472``);
  4. MADGRAD step; final transcript by chunked AR decode with the adapted
     weights (``enc_dec_inference``, ``:1112-1134``).

Host/device split: generation, losses, and updates are jitted; teacher
filters and rewards operate on decoded text (token ids are the only per-chunk
device→host traffic).
"""

from __future__ import annotations

import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dynamic_asr_eval_tpu.augment import spec_augment
from dynamic_asr_eval_tpu.config import TTAConfig
from dynamic_asr_eval_tpu.models.encdec import EncDecConfig, generate_encdec
from dynamic_asr_eval_tpu.ops.chunk import chunk_starts_and_lengths
from dynamic_asr_eval_tpu.ops.ctc import ctc_loss
from dynamic_asr_eval_tpu.optim.madgrad import madgrad
from dynamic_asr_eval_tpu.text.wer import word_error_rate_detail
from dynamic_asr_eval_tpu.tta.filters import TeacherFilterConfig, should_skip_teacher


def calc_rewards(ref: str, hyps: List[str]) -> List[float]:
    """Mean of (1−WER, 1−CER, BLEU/100) per hypothesis
    (``lcasr/lib.py:1330-1359``)."""
    import sacrebleu

    rewards = []
    for hyp in hyps:
        if len(hyp.strip()) == 0 and len(ref.strip()) == 0:
            rewards.append(1.0)
            continue
        if len(ref.strip()) == 0 and len(hyp.strip()) > 0:
            rewards.append(len(hyp.strip().split()) * -1.0)
            continue
        wer = 1.0 - word_error_rate_detail([hyp], [ref])[0]
        cer = 1.0 - word_error_rate_detail([hyp], [ref], use_cer=True)[0]
        bleu = sacrebleu.corpus_bleu([hyp], [[ref]]).score / 100.0
        rewards.append((wer + cer + bleu) / 3.0)
    return rewards


def add_eos_and_targets(tokens_bos: jnp.ndarray, lengths_bos: jnp.ndarray, eos_id: int):
    """Shift-left targets with EOS at each sequence end (reference
    ``add_eos``/``mark_padding`` semantics, used at ``lcasr/lib.py:1281-1287``)."""
    targets = jnp.concatenate(
        [tokens_bos[:, 1:], jnp.zeros_like(tokens_bos[:, :1])], axis=1
    )
    T = targets.shape[1]
    pos = jnp.arange(T)[None, :]
    targets = jnp.where(pos == (lengths_bos - 1)[:, None], eos_id, targets)
    mask = pos < lengths_bos[:, None]
    return targets, mask


class EncDecDynamicEvalEngine:
    def __init__(
        self,
        model,
        variables_template,
        config: EncDecConfig,
        tta_config: TTAConfig,
        filter_config: Optional[TeacherFilterConfig] = None,
        optimizer: Optional[optax.GradientTransformation] = None,
        training_mode: str = "grpo",  # grpo | maxrl | teacher_ce
        num_rollouts: int = 4,
        max_generate: int = 256,
        maxrl_success_threshold: float = 0.9,
        reward_skip_threshold: float = 0.95,
    ):
        self.model = model
        self.config = config
        self.tta = tta_config
        self.filters = filter_config or TeacherFilterConfig()
        self.training_mode = training_mode
        self.num_rollouts = num_rollouts
        self.max_generate = max_generate
        self.maxrl_success_threshold = maxrl_success_threshold
        self.reward_skip_threshold = reward_skip_threshold
        if optimizer is None:
            opt_args = dict(tta_config.optim_args)
            lr = opt_args.pop("lr", 9e-5)
            optimizer = madgrad(learning_rate=lr, **opt_args)
        # The reference freezes the positional-encoding modules before
        # building the TTA optimizer (``modules_to_freeze = [model.
        # language_model_decoder.pos_enc, model.pos_enc]``, lcasr/lib.py:
        # 1505-1535): frozen torch params never receive grads, so the
        # optimizer neither updates them nor accumulates state for them.
        # The encoder's positions are rotary (parameter-free) here, so the
        # decoder's learned text positional embedding (``pos_enc`` in the
        # flax tree) is the only affected leaf.  multi_transform (NOT
        # optax.masked, which passes un-masked leaves' raw grads through as
        # updates) routes it to set_to_zero.  Pinned against the reference
        # source by tests/test_reference_source_encdec_oracle.py.
        def _labels(params):
            def lab(path, _):
                frozen = any(
                    getattr(k, "key", getattr(k, "name", None)) == "pos_enc"
                    for k in path
                )
                return "freeze" if frozen else "train"
            return jax.tree_util.tree_map_with_path(lab, params)

        self.optimizer = optax.multi_transform(
            {"train": optimizer, "freeze": optax.set_to_zero()}, _labels
        )
        self._jit_cache: Dict = {}

    # -- jitted pieces ------------------------------------------------------

    def _policy_loss_fn(self, params, extra_vars, audio, a_len, hyp_tokens,
                        hyp_lengths, advantages, per_token: bool):
        """Policy-gradient loss over rollouts (``_policy_forward`` +
        ``update_grpo``/``update_maxrl``, ``lcasr/lib.py:1361-1472``)."""
        cfg = self.config
        B = hyp_tokens.shape[0]
        tokens_bos = jnp.concatenate(
            [jnp.full((B, 1), cfg.bos_id, jnp.int32), hyp_tokens], axis=1
        )
        lengths_bos = hyp_lengths + 1
        out = self.model.apply(
            {"params": params, **extra_vars},
            jnp.repeat(audio, B, axis=0),
            tokens_bos,
            length=jnp.repeat(a_len, B, axis=0),
            text_lengths=lengths_bos,
        )
        logits = out["final_posteriors_lm"]  # [B, L+1, V]
        targets, mask = add_eos_and_targets(tokens_bos, lengths_bos, cfg.eos_id)
        lps = jax.nn.log_softmax(logits, axis=-1)
        tok_lps = jnp.take_along_axis(lps, targets[..., None], axis=-1)[..., 0]
        if per_token:  # maxrl: mean over all tokens of -lp * adv
            per_tok = -tok_lps * advantages[:, None]
            per_tok = jnp.where(mask, per_tok, 0.0)
            return per_tok.sum() / jnp.maximum(mask.sum(), 1)
        # grpo: sequence-mean log-prob × advantage
        counts = jnp.maximum(mask.sum(axis=-1), 1)
        seq_mean = (tok_lps * mask).sum(axis=-1) / counts
        return -(seq_mean * advantages).mean()

    def _teacher_ce_loss_fn(self, params, extra_vars, audio, a_len,
                            teacher_tokens, teacher_len):
        """Joint CTC+CE supervised loss (``calc_loss_enc_dec``,
        ``lcasr/lib.py:1228-1322``)."""
        cfg = self.config
        B = audio.shape[0]
        tokens = jnp.repeat(teacher_tokens[None], B, axis=0)
        t_lens = jnp.repeat(teacher_len[None], B, axis=0)
        tokens_bos = jnp.concatenate(
            [jnp.full((B, 1), cfg.bos_id, jnp.int32), tokens], axis=1
        )
        lengths_bos = t_lens + 1
        out = self.model.apply(
            {"params": params, **extra_vars}, audio, tokens_bos,
            length=jnp.repeat(a_len, B, axis=0), text_lengths=lengths_bos,
        )
        loss = 0.0
        w = cfg.ctc_loss_weight
        if w > 0:
            ctc_lp = out["final_posteriors_ctc"]
            ds_len = out["length"]
            # normalize by the chunk's ACTUAL downsampled length (the
            # reference divides by the ragged output's N, calc_loss_enc_dec
            # ``lcasr/lib.py:1266-1268``); the padded static shape would
            # under-weight tail chunks by up to the pad ratio
            ctc = ctc_loss(
                ctc_lp, ds_len, tokens, t_lens,
                blank_id=cfg.encoder.blank_id,
            ) / (ctc_lp.shape[0] * jnp.maximum(ds_len[0], 1)) * 100
            loss = loss + w * ctc
        logits = out["final_posteriors_lm"]
        targets, mask = add_eos_and_targets(tokens_bos, lengths_bos, cfg.eos_id)
        lps = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(lps, targets[..., None], axis=-1)[..., 0]
        ce = jnp.where(mask, nll, 0.0).sum() / (logits.shape[0] * logits.shape[1])
        loss = loss + (1 - w) * ce
        return loss

    def _get_update_fn(self, kind: str):
        key = ("update", kind)
        if key in self._jit_cache:
            return self._jit_cache[key]

        if kind == "teacher_ce":
            def fn(params, opt_state, extra_vars, audio, a_len, toks, tlen):
                loss, grads = jax.value_and_grad(self._teacher_ce_loss_fn)(
                    params, extra_vars, audio, a_len, toks, tlen
                )
                updates, opt_state = self.optimizer.update(grads, opt_state, params)
                return optax.apply_updates(params, updates), opt_state, loss
        else:
            per_token = kind == "maxrl"

            def fn(params, opt_state, extra_vars, audio, a_len, toks, tlens, advs):
                loss, grads = jax.value_and_grad(self._policy_loss_fn)(
                    params, extra_vars, audio, a_len, toks, tlens, advs, per_token
                )
                updates, opt_state = self.optimizer.update(grads, opt_state, params)
                return optax.apply_updates(params, updates), opt_state, loss

        self._jit_cache[key] = jax.jit(fn)
        return self._jit_cache[key]

    # -- main ---------------------------------------------------------------

    def __call__(
        self,
        variables: Dict[str, Any],
        spec: np.ndarray,
        seq_len: int,
        tokenizer,
        rng: Optional[jax.Array] = None,
        return_params: bool = False,
    ):
        cfg = self.config
        tta = self.tta
        spec = np.asarray(spec)
        if spec.ndim == 3:
            spec = spec[0]
        spec_n = spec.shape[-1]
        seq_len = min(seq_len, spec_n)
        starts, lengths = chunk_starts_and_lengths(spec_n, seq_len, 0)
        rng = rng if rng is not None else jax.random.PRNGKey(0)

        params = variables["params"]
        extra_vars = {k: v for k, v in variables.items() if k != "params"}
        opt_state = self.optimizer.init(params)

        t0 = time.time()
        for epoch in range(max(tta.epochs, 0)):
            order = list(range(len(starts)))
            for idx in order:
                s, L = starts[idx], lengths[idx]
                chunk = spec[:, s : s + L]
                # pad to seq_len for shape stability
                chunk_p = np.zeros((spec.shape[0], seq_len), spec.dtype)
                chunk_p[:, :L] = chunk
                audio = jnp.asarray(chunk_p)[None]
                a_len = jnp.asarray([L], jnp.int32)
                rng, k_aug, k_gen, k_roll = jax.random.split(rng, 4)

                aug = spec_augment(audio, k_aug, tta.spec_augment)

                # teacher decode (clean copy)
                t_toks, t_lens, enc_out = generate_encdec(
                    self.model, {"params": params, **extra_vars}, audio, cfg,
                    rng=k_gen, sample=1, greedy=True,
                    max_generate=self.max_generate, length=a_len,
                )
                t_len = int(t_lens[0])
                teacher_tokens = [int(x) for x in np.asarray(t_toks[0])[:t_len]]
                teacher_text = tokenizer.decode(teacher_tokens).strip()

                mean_max_prob = mean_entropy = None
                ctc_text = agreement_text = None
                if self.filters.needs_teacher_forced_pass and t_len > 0:
                    tf_tokens = jnp.asarray([[cfg.bos_id] + teacher_tokens], jnp.int32)
                    out = self.model.apply(
                        {"params": params, **extra_vars}, audio, tf_tokens,
                        length=a_len,
                    )
                    probs = jax.nn.softmax(out["final_posteriors_lm"][0, :t_len], axis=-1)
                    mean_max_prob = float(jnp.max(probs, -1).mean())
                    plogp = probs * jnp.log(jnp.maximum(probs, 1e-12))
                    mean_entropy = float((-plogp.sum(-1)).mean())
                    if self.filters.ctc_agreement_enabled:
                        from dynamic_asr_eval_tpu.ops.ctc import greedy_decode

                        ctc_text = greedy_decode(
                            np.asarray(out["final_posteriors_ctc"][0]),
                            tokenizer, cfg.encoder.blank_id,
                            input_length=int(out["length"][0]),
                        ).strip()
                if self.filters.needs_agreement_decode:
                    ag_toks, ag_lens, _ = generate_encdec(
                        self.model, {"params": params, **extra_vars}, audio, cfg,
                        rng=k_roll, sample=1, greedy=False,
                        temperature=self.filters.decode_agreement_temperature,
                        max_generate=self.max_generate, length=a_len,
                        encoder_out=enc_out,
                    )
                    agreement_text = tokenizer.decode(
                        [int(x) for x in np.asarray(ag_toks[0])[: int(ag_lens[0])]]
                    ).strip()

                skip, reason = should_skip_teacher(
                    self.filters, teacher_tokens, teacher_text, L,
                    agreement_text, mean_max_prob, mean_entropy, ctc_text,
                )
                if skip:
                    print(f"Skipping teacher update: {reason}")
                    continue

                if self.training_mode == "teacher_ce":
                    if t_len == 0:
                        continue
                    fn = self._get_update_fn("teacher_ce")
                    params, opt_state, loss = fn(
                        params, opt_state, extra_vars, aug, a_len,
                        jnp.asarray(teacher_tokens, jnp.int32),
                        jnp.asarray(t_len, jnp.int32),
                    )
                else:
                    # rollouts from the augmented copy
                    r_toks, r_lens, _ = generate_encdec(
                        self.model, {"params": params, **extra_vars}, aug, cfg,
                        rng=k_roll, sample=self.num_rollouts, greedy=False,
                        max_generate=self.max_generate, length=a_len,
                    )
                    r_lens_np = np.asarray(r_lens)
                    hyps = [
                        tokenizer.decode(
                            [int(x) for x in np.asarray(r_toks[i])[: r_lens_np[i]]]
                        ).strip()
                        for i in range(self.num_rollouts)
                    ]
                    rewards = calc_rewards(teacher_text, hyps)
                    mean_r = sum(rewards) / len(rewards)
                    if mean_r > self.reward_skip_threshold:
                        continue
                    if self.training_mode == "maxrl":
                        binr = np.array(
                            [1.0 if r >= self.maxrl_success_threshold else 0.0 for r in rewards],
                            np.float32,
                        )
                        pass_rate = binr.mean()
                        if pass_rate <= 0 or pass_rate >= 1:
                            continue
                        advs = (binr - pass_rate) / (pass_rate + 1e-6)
                    else:
                        r = np.asarray(rewards, np.float32)
                        advs = (r - r.mean()) / (r.std() + 1e-7)
                    fn = self._get_update_fn(self.training_mode)
                    params, opt_state, loss = fn(
                        params, opt_state, extra_vars, aug, a_len,
                        r_toks, r_lens, jnp.asarray(advs),
                    )

        # final transcript: chunked greedy AR decode with adapted weights
        transcript = enc_dec_inference(
            self.model, {"params": params, **extra_vars}, spec, seq_len,
            tokenizer, cfg, max_generate=self.max_generate,
        )
        elapsed = time.time() - t0
        if return_params:
            return transcript, params, elapsed
        return transcript, None, elapsed


def enc_dec_inference(model, variables, spec, seq_len, tokenizer, config: EncDecConfig,
                      max_generate: int = 256) -> str:
    """Chunked greedy AR transcription (``enc_dec_inference``,
    ``lcasr/lib.py:1112-1134``)."""
    spec = np.asarray(spec)
    if spec.ndim == 3:
        spec = spec[0]
    spec_n = spec.shape[-1]
    seq_len = min(seq_len, spec_n)
    starts, lengths = chunk_starts_and_lengths(spec_n, seq_len, 0)
    texts = []
    for s, L in zip(starts, lengths):
        chunk_p = np.zeros((spec.shape[0], seq_len), spec.dtype)
        chunk_p[:, :L] = spec[:, s : s + L]
        toks, lens, _ = generate_encdec(
            model, variables, jnp.asarray(chunk_p)[None], config,
            sample=1, greedy=True, max_generate=max_generate,
            length=jnp.asarray([L], jnp.int32),
        )
        texts.append(
            tokenizer.decode([int(x) for x in np.asarray(toks[0])[: int(lens[0])]]).strip()
        )
    return " ".join(texts).replace("  ", " ").strip()
