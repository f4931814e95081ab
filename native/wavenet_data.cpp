// Native data-path hot loops for the wavenet_vocoder_tpu input pipeline.
//
// The reference delegates all native compute to torch/cuDNN and keeps the
// data path in Python/numpy (SURVEY.md: "zero C++ components"). At production
// batch sizes the Python-side collate cost is dominated by (a) one-hot
// expansion of mu-law codes (batch x 10240 x 256 f32 writes) and (b) mu-law
// companding over raw audio. This library implements those as tight loops,
// exposed via a C ABI for ctypes (no pybind11 in this image).
//
// Build: make -C native   (produces libwavenet_data.so)
#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// one-hot expand int32 codes -> f32, dst shape (n, num_classes), zero-filled
// here. Returns 0 on success, -1 if any code is out of range.
int onehot_f32(const int32_t* codes, int64_t n, int32_t num_classes,
               float* dst) {
    std::memset(dst, 0, sizeof(float) * static_cast<size_t>(n) * num_classes);
    for (int64_t i = 0; i < n; ++i) {
        int32_t c = codes[i];
        if (c < 0 || c >= num_classes) return -1;
        dst[i * num_classes + c] = 1.0f;
    }
    return 0;
}

// mu-law companding: y = sign(x) * log1p(mu|x|) / log1p(mu)
void mulaw_f32(const float* x, int64_t n, float mu, float* dst) {
    const float denom = std::log1p(mu);
    for (int64_t i = 0; i < n; ++i) {
        float v = x[i];
        float m = std::log1p(mu * std::fabs(v)) / denom;
        dst[i] = v < 0.0f ? -m : m;
    }
}

// mu-law companding + quantize to [0, mu] (truncating, matches the
// python path in ops/mulaw.py)
void mulaw_quantize_i32(const float* x, int64_t n, float mu, int32_t* dst) {
    const float denom = std::log1p(mu);
    for (int64_t i = 0; i < n; ++i) {
        float v = x[i];
        float m = std::log1p(mu * std::fabs(v)) / denom;
        float y = v < 0.0f ? -m : m;
        dst[i] = static_cast<int32_t>((y + 1.0f) * 0.5f * mu);
    }
}

// inverse mu-law: x = sign(y) * (1/mu) * ((1+mu)^|y| - 1)
void inv_mulaw_f32(const float* y, int64_t n, float mu, float* dst) {
    for (int64_t i = 0; i < n; ++i) {
        float v = y[i];
        float m = (std::pow(1.0f + mu, std::fabs(v)) - 1.0f) / mu;
        dst[i] = v < 0.0f ? -m : m;
    }
}

// inverse mu-law from int codes [0, mu]
void inv_mulaw_quantize_f32(const int32_t* codes, int64_t n, float mu,
                            float* dst) {
    for (int64_t i = 0; i < n; ++i) {
        float y = 2.0f * static_cast<float>(codes[i]) / mu - 1.0f;
        float m = (std::pow(1.0f + mu, std::fabs(y)) - 1.0f) / mu;
        dst[i] = y < 0.0f ? -m : m;
    }
}

// Batched crop+one-hot assembly: for each row b, copy
// codes[b][start[b] : start[b]+crop_len] one-hot expanded into
// dst (B, crop_len, num_classes) and the raw codes into y (B, crop_len).
// codes_flat is the concatenation of per-utterance code arrays with
// offsets[b] giving each start (offsets[B] = total length).
int crop_onehot_batch_i32(const int32_t* codes_flat, const int64_t* offsets,
                          const int64_t* starts, int64_t batch,
                          int64_t crop_len, int32_t num_classes,
                          float* dst, int32_t* y) {
    std::memset(dst, 0, sizeof(float) *
                static_cast<size_t>(batch) * crop_len * num_classes);
    for (int64_t b = 0; b < batch; ++b) {
        const int32_t* src = codes_flat + offsets[b] + starts[b];
        if (offsets[b] + starts[b] + crop_len > offsets[b + 1]) return -2;
        float* drow = dst + b * crop_len * num_classes;
        int32_t* yrow = y + b * crop_len;
        for (int64_t t = 0; t < crop_len; ++t) {
            int32_t c = src[t];
            if (c < 0 || c >= num_classes) return -1;
            drow[t * num_classes + c] = 1.0f;
            yrow[t] = c;
        }
    }
    return 0;
}

}  // extern "C"
