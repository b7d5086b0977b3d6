// Native data-loader core for the MoPA-TPU host pipeline.
//
// The reference delegates its host-side hot loop to native code through the
// torch DataLoader's C++ workers plus torchsparse/SparseConvNet CUDA ops.
// This library provides the TPU framework's equivalent: the per-sample
// operations that dominate host time — raw scan IO, frustum projection,
// voxel dedup and augment+scale+pad — as a C ABI consumed via ctypes
// (mopa_tpu/data/native_loader.py), with a pure-numpy fallback.
//
// Build: tools/build_native.sh  (g++ -O3 -march=native -shared -fPIC)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <unordered_map>
#include <vector>

extern "C" {

// Read a KITTI-style float32 .bin scan (x, y, z, intensity).
// Returns the number of points read (clamped to capacity), or -1 on error.
int mopa_read_scan(const char* path, float* out_xyzi, int capacity) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    size_t n = std::fread(out_xyzi, sizeof(float) * 4, (size_t)capacity, f);
    std::fclose(f);
    return (int)n;
}

// Read a SemanticKITTI .label file, keeping the lower 16 semantic bits.
int mopa_read_labels(const char* path, int32_t* out, int capacity) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    std::vector<uint32_t> buf(capacity);
    size_t n = std::fread(buf.data(), sizeof(uint32_t), (size_t)capacity, f);
    std::fclose(f);
    for (size_t i = 0; i < n; ++i) out[i] = (int32_t)(buf[i] & 0xFFFFu);
    return (int)n;
}

// Project points through a 3x4 matrix; write (row, col) and an in-frustum
// mask (requires x_fwd > 0 like the reference's front-of-car filter).
void mopa_frustum_project(const float* pts, int n, const float* proj,
                          int img_w, int img_h, float* out_rc,
                          uint8_t* keep) {
    for (int i = 0; i < n; ++i) {
        const float x = pts[i * 4 + 0];
        const float y = pts[i * 4 + 1];
        const float z = pts[i * 4 + 2];
        const float u = proj[0] * x + proj[1] * y + proj[2] * z + proj[3];
        const float v = proj[4] * x + proj[5] * y + proj[6] * z + proj[7];
        const float w = proj[8] * x + proj[9] * y + proj[10] * z + proj[11];
        const float iw = (std::fabs(w) > 1e-9f) ? 1.0f / w : 0.0f;
        const float uu = u * iw;
        const float vv = v * iw;
        out_rc[i * 2 + 0] = vv;  // row
        out_rc[i * 2 + 1] = uu;  // col
        keep[i] = (x > 0.f && w > 0.f && uu > 0.f && uu < (float)img_w &&
                   vv > 0.f && vv < (float)img_h)
                      ? 1
                      : 0;
    }
}

// Rotate + scale points into voxel coordinates, shift to the positive
// octant, optional random translation (reference augment_and_scale_3d):
// out_coords[i] = round((pts @ rot) * scale) - min + transl.
// Returns the number of coords within [0, full_scale) (mask via out_keep).
int mopa_augment_scale(const float* pts, int n, const float* rot /*3x3*/,
                       float scale, int full_scale, const float* transl3,
                       int32_t* out_coords, uint8_t* out_keep) {
    std::vector<float> tmp((size_t)n * 3);
    float mn[3] = {1e30f, 1e30f, 1e30f};
    float mx[3] = {-1e30f, -1e30f, -1e30f};
    for (int i = 0; i < n; ++i) {
        const float x = pts[i * 3 + 0], y = pts[i * 3 + 1], z = pts[i * 3 + 2];
        for (int d = 0; d < 3; ++d) {
            const float c =
                std::nearbyint((x * rot[0 + d] + y * rot[3 + d] + z * rot[6 + d]) *
                               scale);
            tmp[(size_t)i * 3 + d] = c;
            if (c < mn[d]) mn[d] = c;
            if (c > mx[d]) mx[d] = c;
        }
    }
    float off[3];
    for (int d = 0; d < 3; ++d) {
        float room = (float)full_scale - (mx[d] - mn[d]) - 0.001f;
        if (room < 0.f) room = 0.f;
        off[d] = -mn[d] + room * transl3[d];
    }
    int kept = 0;
    for (int i = 0; i < n; ++i) {
        bool ok = true;
        for (int d = 0; d < 3; ++d) {
            const int32_t c = (int32_t)(tmp[(size_t)i * 3 + d] + off[d]);
            out_coords[i * 3 + d] = c;
            ok = ok && c >= 0 && c < full_scale;
        }
        out_keep[i] = ok ? 1 : 0;
        kept += ok ? 1 : 0;
    }
    return kept;
}

// Dedup int voxel coords (torchsparse sparse_quantize semantics): writes the
// first-occurrence index of each unique voxel and the per-point inverse map.
// Returns the unique count (clamped to capacity; overflow points map to -1).
int mopa_voxel_dedup(const int32_t* coords, int n, int32_t* out_index,
                     int32_t* out_inverse, int capacity) {
    std::unordered_map<uint64_t, int32_t> table;
    table.reserve((size_t)n * 2);
    int unique = 0;
    for (int i = 0; i < n; ++i) {
        const uint64_t key = ((uint64_t)(uint32_t)coords[i * 3 + 0] << 42) ^
                             ((uint64_t)(uint32_t)coords[i * 3 + 1] << 21) ^
                             (uint64_t)(uint32_t)coords[i * 3 + 2];
        auto it = table.find(key);
        if (it == table.end()) {
            if (unique < capacity) {
                table.emplace(key, unique);
                out_index[unique] = i;
                out_inverse[i] = unique;
                ++unique;
            } else {
                out_inverse[i] = -1;
            }
        } else {
            out_inverse[i] = it->second;
        }
    }
    return unique;
}

}  // extern "C"
