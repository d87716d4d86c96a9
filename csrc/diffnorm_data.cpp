// Native runtime helpers for diffnorm_tpu, exposed via a plain C ABI and
// loaded from Python with ctypes (no pybind11 in this image).
//
// TPU-native equivalents of the reference's native components
// (SURVEY.md section 2d):
//   * batch_by_size   — length-bucketed batching hot loop
//                       (reference: fairseq/data/data_utils_fast.pyx)
//   * bleu_*          — corpus BLEU n-gram counters
//                       (reference: fairseq/clib/libbleu/libbleu.cpp)
//   * edit_distance_batch — batched Levenshtein DP
//                       (reference: fairseq/clib/libnat/edit_dist.cpp)
//   * token_block_*   — token-block slicing for LM datasets
//                       (reference: fairseq/data/token_block_utils_fast.pyx)
//
// Build: make -C csrc   (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// batch_by_size: group `indices` into batches bounded by max_tokens
// (= batch_size * max-size-in-batch, since batches pad to their longest
// member) and/or max_sentences, keeping batch sizes < mult or a multiple of
// mult. EXACT reference semantics (fairseq/data/data_utils_fast.pyx
// batch_by_size_vec:20-105): a committed batch [batch_start, ends[k]) plus a
// running tail; the tail joins the batch whenever the combined size respects
// the multiple rule, and on overflow the committed batch is finalized (two
// batches when the tail itself overflows). Unlike the round-1 greedy
// formulation this never emits a batch exceeding the caps for any input
// order (regression: tests/test_data.py fuzz vs the transcribed reference).
// Returns the number of batches; `bounds` receives n_batches+1 offsets into
// `indices`.
// ---------------------------------------------------------------------------
long batch_by_size(const long* indices, const long* sizes, long n,
                   long max_tokens, long max_sentences, long mult,
                   long* bounds) {
  (void)indices;
  if (n == 0) {
    bounds[0] = 0;
    return 0;
  }
  // up to 2 finalizations per item in the degenerate all-oversize case
  std::vector<long> ends(2 * static_cast<size_t>(n) + 2, 0);
  long batches_count = 0;
  long batch_start = 0;
  long tail_max = 0;   // max size in the running tail [ends[count], pos]
  long batch_max = 0;  // max size in the committed batch
  for (long pos = 0; pos < n; ++pos) {
    long sz = sizes[pos];
    tail_max = std::max(tail_max, sz);
    long new_end = pos + 1;
    long new_max = std::max(batch_max, tail_max);
    long new_sent = new_end - batch_start;
    long new_tok = new_sent * new_max;
    bool overflow = (max_sentences > 0 && new_sent > max_sentences) ||
                    (max_tokens > 0 && new_tok > max_tokens);
    bool size_matches = (new_sent < mult) || (new_sent % mult == 0);
    if (overflow) {
      long tail_tok = tail_max * (new_end - ends[batches_count]);
      bool tail_overflow = max_tokens > 0 && tail_tok > max_tokens;
      if (tail_overflow) {
        // corner case: the tail alone violates max_tokens — finalize the
        // tail-without-pos as its own batch too
        batches_count += 1;
        ends[batches_count] = pos;
        tail_max = sz;
      }
      batch_start = ends[batches_count];
      batches_count += 1;
      new_max = tail_max;
    }
    if (overflow || size_matches) {
      ends[batches_count] = new_end;
      batch_max = new_max;
      tail_max = 0;
    }
  }
  if (ends[batches_count] != n) batches_count += 1;
  // pyx returns np.split(indices, ends[:batches_count]) = batches_count+1
  // pieces with boundaries [0, ends[0..batches_count-1], n]. Items larger
  // than max_tokens (the pyx asserts them away; we admit them as singleton
  // batches) produce duplicate boundaries = empty pieces — drop those here,
  // which also bounds the output at n+1 offsets.
  bounds[0] = 0;
  long n_batches = 0;
  for (long k = 0; k < batches_count; ++k) {
    if (ends[k] > bounds[n_batches]) bounds[++n_batches] = ends[k];
  }
  if (bounds[n_batches] != n) bounds[++n_batches] = n;
  return n_batches;
}

// ---------------------------------------------------------------------------
// Corpus BLEU counters. Streams (ref, hyp) token-id pairs and accumulates
// n-gram match/total statistics for n=1..4 plus lengths. Clipped counts via
// per-sentence ref n-gram multiset.
// ---------------------------------------------------------------------------
struct BleuStat {
  long reflen = 0, predlen = 0;
  long match[4] = {0, 0, 0, 0};
  long total[4] = {0, 0, 0, 0};
};

static void count_ngrams(const int* toks, long n, int order,
                         std::map<std::vector<int>, long>* out) {
  for (long i = 0; i + order <= n; ++i) {
    std::vector<int> key(toks + i, toks + i + order);
    (*out)[key] += 1;
  }
}

void bleu_zero(BleuStat* stat) { *stat = BleuStat(); }

void bleu_add(BleuStat* stat, const int* ref, long ref_len, const int* hyp,
              long hyp_len, int pad, int eos) {
  // strip pad/eos
  std::vector<int> r, h;
  for (long i = 0; i < ref_len; ++i)
    if (ref[i] != pad && ref[i] != eos) r.push_back(ref[i]);
  for (long i = 0; i < hyp_len; ++i)
    if (hyp[i] != pad && hyp[i] != eos) h.push_back(hyp[i]);
  stat->reflen += (long)r.size();
  stat->predlen += (long)h.size();
  for (int order = 1; order <= 4; ++order) {
    std::map<std::vector<int>, long> rn, hn;
    count_ngrams(r.data(), (long)r.size(), order, &rn);
    count_ngrams(h.data(), (long)h.size(), order, &hn);
    for (auto& kv : hn) {
      stat->total[order - 1] += kv.second;
      auto it = rn.find(kv.first);
      if (it != rn.end())
        stat->match[order - 1] += std::min(kv.second, it->second);
    }
  }
}

long bleu_stat_size() { return (long)sizeof(BleuStat); }

void bleu_counts(const BleuStat* stat, long* out /* len 10 */) {
  out[0] = stat->reflen;
  out[1] = stat->predlen;
  for (int i = 0; i < 4; ++i) {
    out[2 + 2 * i] = stat->match[i];
    out[3 + 2 * i] = stat->total[i];
  }
}

// ---------------------------------------------------------------------------
// Batched Levenshtein edit distance over padded token matrices.
// refs/hyps: [b, rlen]/[b, hlen] int32 padded with `pad`.
// out: [b] distances.
// ---------------------------------------------------------------------------
void edit_distance_batch(const int* refs, const int* hyps, long b, long rlen,
                         long hlen, int pad, long* out) {
  std::vector<long> prev(hlen + 1), cur(hlen + 1);
  for (long s = 0; s < b; ++s) {
    const int* r = refs + s * rlen;
    const int* h = hyps + s * hlen;
    long rn = 0, hn = 0;
    while (rn < rlen && r[rn] != pad) ++rn;
    while (hn < hlen && h[hn] != pad) ++hn;
    for (long j = 0; j <= hn; ++j) prev[j] = j;
    for (long i = 1; i <= rn; ++i) {
      cur[0] = i;
      for (long j = 1; j <= hn; ++j) {
        long sub = prev[j - 1] + (r[i - 1] != h[j - 1]);
        cur[j] = std::min(std::min(prev[j] + 1, cur[j - 1] + 1), sub);
      }
      std::swap(prev, cur);
    }
    out[s] = prev[hn];
  }
}

// ---------------------------------------------------------------------------
// Levenshtein edit-path supervision (reference: fairseq/clib/libnat
// suggested_ed2_path): for each (prev, tgt) pair, LCS-align and emit
//   del_tgt  [b, plen]   1 where prev[i] should be deleted
//   ins_tgt  [b, plen+1] number of tgt tokens to insert before kept prev[i]
// prev/tgt padded with `pad`.
// ---------------------------------------------------------------------------
void edit_path_batch(const int* prevs, const int* tgts, long b, long plen,
                     long tlen, int pad, int* del_tgt, int* ins_tgt) {
  std::vector<long> dp;
  for (long s = 0; s < b; ++s) {
    const int* p = prevs + s * plen;
    const int* t = tgts + s * tlen;
    long pn = 0, tn = 0;
    while (pn < plen && p[pn] != pad) ++pn;
    while (tn < tlen && t[tn] != pad) ++tn;
    // LCS DP
    dp.assign((pn + 1) * (tn + 1), 0);
    auto at = [&](long i, long j) -> long& { return dp[i * (tn + 1) + j]; };
    for (long i = 1; i <= pn; ++i)
      for (long j = 1; j <= tn; ++j)
        at(i, j) = (p[i - 1] == t[j - 1])
                       ? at(i - 1, j - 1) + 1
                       : std::max(at(i - 1, j), at(i, j - 1));
    // backtrack: matched prev positions keep, unmatched delete; tgt tokens
    // between matches become insertions at the preceding slot
    int* del_row = del_tgt + s * plen;
    int* ins_row = ins_tgt + s * (plen + 1);
    for (long i = 0; i < plen; ++i) del_row[i] = 0;
    for (long i = 0; i <= plen; ++i) ins_row[i] = 0;
    long i = pn, j = tn;
    std::vector<long> kept;  // matched prev indices (reversed)
    std::vector<long> match_t(pn, -1);
    while (i > 0 && j > 0) {
      if (p[i - 1] == t[j - 1] && at(i, j) == at(i - 1, j - 1) + 1) {
        match_t[i - 1] = j - 1;
        --i; --j;
      } else if (at(i - 1, j) >= at(i, j - 1)) {
        del_row[i - 1] = 1;
        --i;
      } else {
        --j;
      }
    }
    while (i > 0) { del_row[i - 1] = 1; --i; }
    // insertion counts: walk tgt, count unmatched tgt tokens per slot.
    // slot k (0..#kept) = before the k-th kept prev token (after deletions)
    long slot = 0, tj = 0;
    for (long pi = 0; pi < pn; ++pi) {
      if (del_row[pi]) continue;
      long mt = match_t[pi];
      ins_row[slot] = (int)(mt - tj);
      tj = mt + 1;
      ++slot;
    }
    ins_row[slot] = (int)(tn - tj);
  }
}

// ---------------------------------------------------------------------------
// Token-block slicing (LM datasets): given per-document sizes, produce
// [start_doc, start_off, end_doc, end_off] slices of `block_size` tokens
// ("none" mode: contiguous blocks across document boundaries).
// Returns number of blocks; slices buffer must hold 4 * ceil(total/block).
// ---------------------------------------------------------------------------
long token_block_slices(const long* sizes, long n_docs, long block_size,
                        long* slices) {
  long total = 0;
  for (long i = 0; i < n_docs; ++i) total += sizes[i];
  long n_blocks = (total + block_size - 1) / block_size;
  long doc = 0, off = 0;
  for (long blk = 0; blk < n_blocks; ++blk) {
    long remaining = std::min(block_size, total - blk * block_size);
    slices[4 * blk + 0] = doc;
    slices[4 * blk + 1] = off;
    while (remaining > 0 && doc < n_docs) {
      long avail = sizes[doc] - off;
      if (avail > remaining) {
        off += remaining;
        remaining = 0;
      } else {
        remaining -= avail;
        ++doc;
        off = 0;
      }
    }
    slices[4 * blk + 2] = doc;
    slices[4 * blk + 3] = off;
  }
  return n_blocks;
}

// ---------------------------------------------------------------------------
// Balanced expert assignment (reference: fairseq/clib/libbase/
// balanced_assignment.cpp — the k-jobs-per-worker AUCTION algorithm,
// Bertsekas P-2108). Exact reference semantics, pinned against the compiled
// real libbase in tests/test_reference_parity.py: each expert ("worker")
// bids its value margin over its (k+1)-th best token ("job") plus epsilon;
// popular tokens get more expensive (cost += winning bid) until every token
// has a bidder; after 100 iterations the value resets fall back to raw
// scores (the reference's fast-converging approximation). scores:
// [n_tokens, n_experts] row-major; out: [n_tokens] expert ids. n_tokens
// must be divisible by n_experts.
// ---------------------------------------------------------------------------
void balanced_assignment(const float* scores, long n_tokens, long n_experts,
                         long* out) {
  const long n = n_tokens, e = n_experts, k = n_tokens / n_experts;
  const int max_iterations = 100;
  float smin = scores[0], smax = scores[0];
  for (long i = 1; i < n * e; ++i) {
    smin = std::min(smin, scores[i]);
    smax = std::max(smax, scores[i]);
  }
  const float epsilon = std::max((smax - smin) / 50.0f, 1e-4f);
  const float max_value = smax;
  // worker_and_job_to_score = scores^T  [e, n]
  std::vector<float> wj(e * n);
  for (long t = 0; t < n; ++t)
    for (long w = 0; w < e; ++w) wj[w * n + t] = scores[t * e + w];
  std::vector<float> value(wj);           // value = wj - cost (maintained)
  std::vector<float> cost(n, 0.0f);
  std::vector<float> bids(e * n);
  std::vector<long> top_idx(e * (k + 1));
  std::vector<long> bid_indices;          // flat w*n + j of last round's wins
  std::vector<long> order(n);
  int counter = 0;
  while (true) {
    std::fill(bids.begin(), bids.end(), 0.0f);
    // per worker: top k+1 of its value row (desc, ties -> lower job index)
    for (long w = 0; w < e; ++w) {
      const float* row = &value[w * n];
      for (long j = 0; j < n; ++j) order[j] = j;
      std::partial_sort(order.begin(), order.begin() + k + 1, order.end(),
                        [&](long a, long b) {
                          return row[a] > row[b] ||
                                 (row[a] == row[b] && a < b);
                        });
      const float kth = row[order[k]];
      for (long j = 0; j < k + 1; ++j) top_idx[w * (k + 1) + j] = order[j];
      for (long j = 0; j < k; ++j)
        bids[w * n + order[j]] = row[order[j]] - kth + epsilon;
    }
    if (counter < max_iterations && counter > 0) {
      // minimal retention bid for last round's wins (overwrites, like the
      // reference's index_put_)
      for (long idx : bid_indices) bids[idx] = epsilon;
    }
    // highest bidder per job (ties -> lowest worker, torch::max_out order)
    bool all_have = true;
    std::vector<long> high_bidders(n, 0);
    std::vector<float> high_bids(n, 0.0f);
    for (long j = 0; j < n; ++j) {
      float hb = bids[j];
      long hw = 0;
      for (long w = 1; w < e; ++w) {
        if (bids[w * n + j] > hb) {
          hb = bids[w * n + j];
          hw = w;
        }
      }
      high_bids[j] = hb;
      high_bidders[j] = hw;
      if (!(hb > 0.0f)) all_have = false;
    }
    if (all_have) break;
    for (long j = 0; j < n; ++j) cost[j] += high_bids[j];
    for (long w = 0; w < e; ++w)
      for (long j = 0; j < n; ++j) value[w * n + j] = wj[w * n + j] - cost[j];
    bid_indices.clear();
    for (long j = 0; j < n; ++j) {
      if (high_bids[j] > 0.0f) {
        long idx = high_bidders[j] * n + j;
        bid_indices.push_back(idx);
        // make sure the winner keeps this job in its top-k next round
        value[idx] = (counter < max_iterations) ? max_value : wj[idx];
      }
    }
    ++counter;
  }
  // final holdings: worker w keeps its current top-k jobs
  for (long w = 0; w < e; ++w)
    for (long j = 0; j < k; ++j) out[top_idx[w * (k + 1) + j]] = w;
}

// ---------------------------------------------------------------------------
// MMA expected alignment (reference: examples/operators/
// alignment_train_cpu.cpp alignmentTrainCPUImpl — the op behind
// expected_alignment_from_p_choose, arXiv 1704.00784). alpha must be
// zero-initialized by the caller; exact reference semantics incl. the
// exclusive cumprod, [eps, 1] clamp inside the division, and per-element
// [0, 1] clip of the stored alpha. Pinned against the COMPILED real op in
// tests/test_reference_parity.py.
// ---------------------------------------------------------------------------
void alignment_train(const float* p_choose, float* alpha, long bsz,
                     long tgt_len, long src_len, float eps) {
  const long n = tgt_len * src_len;
  std::vector<float> cumprod(src_len), clamp(src_len);
  for (long b = 0; b < bsz; ++b) alpha[b * n] = 1.0f;
  for (long b = 0; b < bsz; ++b) {
    for (long t = 0; t < tgt_len; ++t) {
      const float* p = p_choose + b * n + t * src_len;
      // exclusive cumprod of (1 - p) along src
      float run = 1.0f;
      for (long s = 0; s < src_len; ++s) {
        cumprod[s] = run;
        clamp[s] = std::min(std::max(run, eps), 1.0f);
        run *= 1.0f - p[s];
      }
      const float* prev = (t == 0) ? alpha + b * n
                                   : alpha + b * n + (t - 1) * src_len;
      float* out = alpha + b * n + t * src_len;
      float scan = 0.0f;
      for (long s = 0; s < src_len; ++s) {
        // t==0 reads its own row in place, exactly like the reference:
        // [1, 0, 0, ...] since only [b][0][0] is pre-initialized and each
        // slot is read before it is overwritten
        scan += prev[s] / clamp[s];
        out[s] = std::min(std::max(scan * p[s] * cumprod[s], 0.0f), 1.0f);
      }
    }
  }
}

// ---------------------------------------------------------------------------
// Best monotonic path through a [tx, ty] log-probability matrix (every
// source step advances 0 or 1 target steps; all targets covered) — the
// Viterbi companion to the expected alignment above, used by duration
// training. Returns per-source target indices.
// ---------------------------------------------------------------------------
void best_monotonic_alignment(const float* logp, long tx, long ty,
                              long* path) {
  std::vector<float> prev(ty, -1e30f), cur(ty);
  std::vector<unsigned char> back(tx * ty, 0);
  prev[0] = logp[0];
  for (long i = 1; i < tx; ++i) {
    const float* row = logp + i * ty;
    for (long j = 0; j < ty; ++j) {
      float stay = prev[j];
      float step = (j > 0) ? prev[j - 1] : -1e30f;
      if (step > stay) {
        cur[j] = step + row[j];
        back[i * ty + j] = 1;
      } else {
        cur[j] = stay + row[j];
      }
    }
    std::swap(prev, cur);
  }
  long j = ty - 1;
  for (long i = tx - 1; i >= 0; --i) {
    path[i] = j;
    if (back[i * ty + j] && j > 0) --j;
  }
}

}  // extern "C"
