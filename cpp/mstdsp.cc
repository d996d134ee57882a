// Native host DSP for music_mixing_style_transfer_tpu.
//
// C++ equivalents of the reference's compiled surface (SURVEY.md §2.1):
//  - the numba-JIT compressor envelope follower
//    (reference common_audioeffects.py:529-587)
//  - pymixconsole's biquad IIR filtering (scipy lfilter direct-form II
//    transposed; reference common_audioeffects.py:438-525)
//
// Used as (a) a bit-accurate golden oracle for the TPU kernels and (b) a
// fast host-side path for CPU data preparation. Built as a shared library,
// bound via ctypes (music_mixing_style_transfer_tpu/native.py).

#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// Exact port of the documented envelope-follower semantics: log-domain
// static gain curve + branchy one-pole attack/release smoothing.
// x, y: length n. Returns the final envelope state (for block chaining).
double mst_compressor_process(const float* x, float* y, int64_t n,
                              double threshold, double attack_ms,
                              double release_ms, double ratio,
                              double makeup_db, double sample_rate,
                              double y_prev) {
  const double alpha_att = std::exp(-1.0 / (0.001 * sample_rate * attack_ms));
  const double alpha_rel = std::exp(-1.0 / (0.001 * sample_rate * release_ms));
  for (int64_t i = 0; i < n; ++i) {
    const double ax = std::fabs((double)x[i]);
    double x_g = (ax < 1e-6) ? -120.0 : 20.0 * std::log10(ax);
    double y_g = x_g;
    if (ratio > 1.0) {
      if (x_g >= threshold) y_g = threshold + (x_g - threshold) / ratio;
    } else if (ratio < 1.0) {
      if (x_g <= threshold) y_g = threshold + (x_g - threshold) * ratio;
    }
    const double x_l = x_g - y_g;
    const double a = (x_l > y_prev) ? alpha_att : alpha_rel;
    const double y_l = a * y_prev + (1.0 - a) * x_l;
    y_prev = y_l;
    y[i] = (float)((double)x[i] * std::pow(10.0, (makeup_db - y_l) / 20.0));
  }
  return y_prev;
}

// Multi-channel compressor: x [channels][n] contiguous rows.
void mst_compressor_process_mc(const float* x, float* y, int64_t channels,
                               int64_t n, double threshold, double attack_ms,
                               double release_ms, double ratio,
                               double makeup_db, double sample_rate) {
  for (int64_t c = 0; c < channels; ++c) {
    mst_compressor_process(x + c * n, y + c * n, n, threshold, attack_ms,
                           release_ms, ratio, makeup_db, sample_rate, 0.0);
  }
}

// Direct-form-II-transposed biquad (scipy lfilter semantics, zero init).
// coeffs: [b0, b1, b2, a1, a2] normalized by a0.
void mst_biquad_lfilter(const float* x, float* y, int64_t n,
                        const double* coeffs) {
  const double b0 = coeffs[0], b1 = coeffs[1], b2 = coeffs[2];
  const double a1 = coeffs[3], a2 = coeffs[4];
  double z1 = 0.0, z2 = 0.0;
  for (int64_t i = 0; i < n; ++i) {
    const double xn = (double)x[i];
    const double yn = b0 * xn + z1;
    z1 = b1 * xn + z2 - a1 * yn;
    z2 = b2 * xn - a2 * yn;
    y[i] = (float)yn;
  }
}

// Cascade of n_filters biquads applied in series (5-band EQ path).
void mst_biquad_cascade(const float* x, float* y, int64_t n,
                        const double* coeffs, int64_t n_filters) {
  // first stage from x, rest in-place on y
  if (n_filters == 0) {
    std::memcpy(y, x, sizeof(float) * (size_t)n);
    return;
  }
  mst_biquad_lfilter(x, y, n, coeffs);
  for (int64_t f = 1; f < n_filters; ++f) {
    mst_biquad_lfilter(y, y, n, coeffs + 5 * f);
  }
}

// BS.1770 K-weighted mean-square per 400 ms gating block (loudness prep):
// y is the K-weighted signal; blocks of length block with hop samples.
void mst_block_mean_square(const float* y, double* out, int64_t n,
                           int64_t block, int64_t hop, int64_t n_blocks) {
  for (int64_t j = 0; j < n_blocks; ++j) {
    const int64_t lo = j * hop;
    double acc = 0.0;
    for (int64_t i = lo; i < lo + block && i < n; ++i) {
      acc += (double)y[i] * (double)y[i];
    }
    out[j] = acc / (double)block;
  }
}

}  // extern "C"
