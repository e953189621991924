// SLIC superpixel segmentation (Achanta et al., TPAMI 2012).
//
// Native replacement for the reference's third-party `fast_slic` C library
// (used at `MIA 2023/stage1_multi_modal_teacher/data_loaders_MT_SP.py:28,116`
// as Slic(num_components, compactness=10).iterate(image)).  This is the only
// native-code tier the reference has (SURVEY §0) — everything else is Python.
//
// Exposed C ABI (ctypes):
//   slic_segment(rgb, H, W, num_components, compactness, iters, labels_out)
//
// rgb: uint8 [H, W, 3]; labels_out: int32 [H, W] in [0, num_components).
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC slic.cpp -o libslic.so

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

struct Center {
    float l, a, b, x, y;
    float acc_l, acc_a, acc_b, acc_x, acc_y;
    int count;
};

// sRGB -> CIELAB (D65), matching the standard SLIC preprocessing.
inline void rgb2lab(uint8_t R, uint8_t G, uint8_t B,
                    float* L, float* A, float* Bb) {
    auto inv = [](float c) {
        c /= 255.0f;
        return (c <= 0.04045f) ? c / 12.92f
                               : std::pow((c + 0.055f) / 1.055f, 2.4f);
    };
    float r = inv(R), g = inv(G), b = inv(B);
    float X = r * 0.4124f + g * 0.3576f + b * 0.1805f;
    float Y = r * 0.2126f + g * 0.7152f + b * 0.0722f;
    float Z = r * 0.0193f + g * 0.1192f + b * 0.9505f;
    X /= 0.95047f; Z /= 1.08883f;
    auto f = [](float t) {
        return (t > 0.008856f) ? std::cbrt(t)
                               : (7.787f * t + 16.0f / 116.0f);
    };
    float fx = f(X), fy = f(Y), fz = f(Z);
    *L = 116.0f * fy - 16.0f;
    *A = 500.0f * (fx - fy);
    *Bb = 200.0f * (fy - fz);
}

}  // namespace

extern "C" {

void slic_segment(const uint8_t* rgb, int H, int W, int num_components,
                  float compactness, int iterations, int32_t* labels) {
    const int N = H * W;
    std::vector<float> lab(static_cast<size_t>(N) * 3);
#pragma omp parallel for schedule(static)
    for (int i = 0; i < N; ++i) {
        rgb2lab(rgb[3 * i], rgb[3 * i + 1], rgb[3 * i + 2],
                &lab[3 * i], &lab[3 * i + 1], &lab[3 * i + 2]);
    }

    // grid-initialised centers
    const float S = std::sqrt(static_cast<float>(N) / num_components);
    int per_row = std::max(1, static_cast<int>(std::round(W / S)));
    std::vector<Center> centers;
    centers.reserve(num_components);
    for (int k = 0; k < num_components; ++k) {
        int gx = k % per_row, gy = k / per_row;
        int x = std::min(W - 1, static_cast<int>((gx + 0.5f) * W / per_row));
        int rows = (num_components + per_row - 1) / per_row;
        int y = std::min(H - 1, static_cast<int>((gy + 0.5f) * H / rows));
        int i = y * W + x;
        centers.push_back({lab[3 * i], lab[3 * i + 1], lab[3 * i + 2],
                           (float)x, (float)y, 0, 0, 0, 0, 0, 0});
    }
    const int K = static_cast<int>(centers.size());
    const float inv_s2 = (compactness * compactness) / (S * S);

    std::vector<float> dist(N);
    for (int it = 0; it < iterations; ++it) {
        std::fill(dist.begin(), dist.end(), 1e30f);
        // assignment: each center scans its 2S x 2S window
        for (int k = 0; k < K; ++k) {
            const Center& c = centers[k];
            int x0 = std::max(0, (int)(c.x - 2 * S)),
                x1 = std::min(W, (int)(c.x + 2 * S) + 1);
            int y0 = std::max(0, (int)(c.y - 2 * S)),
                y1 = std::min(H, (int)(c.y + 2 * S) + 1);
#pragma omp parallel for schedule(static)
            for (int y = y0; y < y1; ++y) {
                for (int x = x0; x < x1; ++x) {
                    int i = y * W + x;
                    float dl = lab[3 * i] - c.l;
                    float da = lab[3 * i + 1] - c.a;
                    float db = lab[3 * i + 2] - c.b;
                    float dx = x - c.x, dy = y - c.y;
                    float d = dl * dl + da * da + db * db
                              + (dx * dx + dy * dy) * inv_s2;
                    if (d < dist[i]) {
                        dist[i] = d;
                        labels[i] = k;
                    }
                }
            }
        }
        // update
        for (auto& c : centers) {
            c.acc_l = c.acc_a = c.acc_b = c.acc_x = c.acc_y = 0;
            c.count = 0;
        }
        for (int y = 0; y < H; ++y) {
            for (int x = 0; x < W; ++x) {
                int i = y * W + x;
                Center& c = centers[labels[i]];
                c.acc_l += lab[3 * i];
                c.acc_a += lab[3 * i + 1];
                c.acc_b += lab[3 * i + 2];
                c.acc_x += x;
                c.acc_y += y;
                c.count++;
            }
        }
        for (auto& c : centers) {
            if (c.count > 0) {
                c.l = c.acc_l / c.count;
                c.a = c.acc_a / c.count;
                c.b = c.acc_b / c.count;
                c.x = c.acc_x / c.count;
                c.y = c.acc_y / c.count;
            }
        }
    }

    // connectivity: merge components smaller than S*S/4 into a neighbour
    const int min_size = std::max(1, static_cast<int>(S * S / 4));
    std::vector<int32_t> out(N, -1);
    std::vector<int> stack;
    stack.reserve(N);
    const int dx4[] = {1, -1, 0, 0}, dy4[] = {0, 0, 1, -1};
    for (int i = 0; i < N; ++i) {
        if (out[i] >= 0) continue;
        int lbl = labels[i];
        // neighbouring already-finalised label for potential merge
        int adj = (i % W > 0 && out[i - 1] >= 0) ? out[i - 1]
                  : (i >= W && out[i - W] >= 0 ? out[i - W] : lbl);
        stack.clear();
        stack.push_back(i);
        out[i] = lbl;
        size_t head = 0;
        while (head < stack.size()) {
            int p = stack[head++];
            int px = p % W, py = p / W;
            for (int d = 0; d < 4; ++d) {
                int nx = px + dx4[d], ny = py + dy4[d];
                if (nx < 0 || nx >= W || ny < 0 || ny >= H) continue;
                int q = ny * W + nx;
                if (out[q] < 0 && labels[q] == lbl) {
                    out[q] = lbl;
                    stack.push_back(q);
                }
            }
        }
        if (static_cast<int>(stack.size()) < min_size && adj != lbl) {
            for (size_t s = 0; s < stack.size(); ++s) out[stack[s]] = adj;
        }
    }
    std::memcpy(labels, out.data(), sizeof(int32_t) * N);
}

}  // extern "C"
