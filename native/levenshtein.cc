// Native Levenshtein alignment with insertion/deletion/substitution counts.
//
// The reference's WER comes from its external `lcasr` package
// (`lcasr.eval.wer.word_error_rate_detail`, used at lcasr/run.py:119) and its
// teacher-agreement CER from the same alignment; both sit on hot host paths:
// the enc-dec RL engine scores 1-WER per sampled rollout
// (lcasr/lib.py:1330-1359) and the teacher filters compute 1-CER agreement
// per chunk (lcasr/enc_dec_teacher_filters.py).  An O(H*R) pure-Python DP is
// seconds per hour-long transcript and minutes for CER; this file is the
// native runtime counterpart (ctypes-bound from text/wer.py, graceful
// Python fallback).
//
// Semantics are bit-identical to text/wer.py::_edit_ops: unit costs, and on
// cost ties the op preference is substitution < deletion < insertion, so
// (ins, del, sub) counts match the Python DP exactly (the NIST/sclite
// convention).  Tokens arrive pre-interned as int32 ids; string interning
// stays in Python where the tokenizer already lives.

#include <cstdint>
#include <vector>

namespace {

struct Cell {
  int32_t cost;
  int32_t ins, del, sub;
};

}  // namespace

extern "C" {

// Fill out[0..2] = (insertions, deletions, substitutions) of the minimal
// alignment transforming ref into hyp.  Returns the total cost.
int64_t lev_edit_ops(const int32_t* hyp, int64_t H, const int32_t* ref,
                     int64_t R, int64_t* out) {
  if (R == 0) {
    out[0] = H;
    out[1] = 0;
    out[2] = 0;
    return H;
  }
  if (H == 0) {
    out[0] = 0;
    out[1] = R;
    out[2] = 0;
    return R;
  }
  std::vector<Cell> prev(R + 1), cur(R + 1);
  for (int64_t j = 0; j <= R; ++j) prev[j] = {static_cast<int32_t>(j), 0, static_cast<int32_t>(j), 0};
  for (int64_t i = 1; i <= H; ++i) {
    cur[0] = {static_cast<int32_t>(i), static_cast<int32_t>(i), 0, 0};
    const int32_t h = hyp[i - 1];
    for (int64_t j = 1; j <= R; ++j) {
      const bool match = (h == ref[j - 1]);
      const int32_t sub_cost = prev[j - 1].cost + (match ? 0 : 1);
      const int32_t del_cost = cur[j - 1].cost + 1;
      const int32_t ins_cost = prev[j].cost + 1;
      if (sub_cost <= del_cost && sub_cost <= ins_cost) {
        cur[j] = prev[j - 1];
        cur[j].cost = sub_cost;
        if (!match) ++cur[j].sub;
      } else if (del_cost <= ins_cost) {
        cur[j] = cur[j - 1];
        cur[j].cost = del_cost;
        ++cur[j].del;
      } else {
        cur[j] = prev[j];
        cur[j].cost = ins_cost;
        ++cur[j].ins;
      }
    }
    prev.swap(cur);
  }
  out[0] = prev[R].ins;
  out[1] = prev[R].del;
  out[2] = prev[R].sub;
  return prev[R].cost;
}

// Corpus batch: n pairs of id sequences packed back to back.
// hyp_lens/ref_lens give per-pair lengths; out accumulates
// (total_ins, total_del, total_sub, total_ref_tokens).
void lev_edit_ops_batch(const int32_t* hyps, const int64_t* hyp_lens,
                        const int32_t* refs, const int64_t* ref_lens,
                        int64_t n, int64_t* out) {
  int64_t ti = 0, td = 0, ts = 0, tw = 0;
  const int32_t* hp = hyps;
  const int32_t* rp = refs;
  int64_t ops[3];
  for (int64_t k = 0; k < n; ++k) {
    lev_edit_ops(hp, hyp_lens[k], rp, ref_lens[k], ops);
    ti += ops[0];
    td += ops[1];
    ts += ops[2];
    tw += ref_lens[k];
    hp += hyp_lens[k];
    rp += ref_lens[k];
  }
  out[0] = ti;
  out[1] = td;
  out[2] = ts;
  out[3] = tw;
}

}  // extern "C"
