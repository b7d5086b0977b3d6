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

#include <algorithm>
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

// ---------------------------------------------------------------------------
// Host-side UNet voxel-plan builder.
//
// Builds the ENTIRE per-sample sparse-UNet plan — per-level voxel tables,
// wide-column submanifold ranks/sel, stride-2 down/up maps and the
// point->voxel inverse — on the otherwise-idle host CPU, overlapped with
// device compute. This replaces ~1/3 of the TPU step (the device-side
// lax.sort-based plan builds) for loader-delivered batches; outputs are
// bit-identical to mopa_tpu.models.scn_unet.build_unet_plan_batched's
// per-sample plans (canonical (x, y, z)-lexicographic voxel order, same
// overflow-drop policy, same wide_from_nbr sel codes).
//
// Output dtypes are compact (int16/int8 where ranges allow) to keep the
// host->device transfer small; the trainer widens and applies per-sample
// slot offsets on device.

namespace {

constexpr int kShift = 4096;  // coordinate range per axis (12 bits)

inline uint64_t pack_key(int32_t x, int32_t y, int32_t z) {
    return ((uint64_t)(uint32_t)x << 24) | ((uint64_t)(uint32_t)y << 12) |
           (uint64_t)(uint32_t)z;
}

struct Level {
    std::vector<int32_t> coords;  // (V, 3) kept voxel coords
    std::vector<uint64_t> keys;   // (V,) sorted keys
    int32_t num = 0;
};

// Sorted-unique voxelisation of (coords, valid) with capacity overflow-drop.
// inverse: per input row, kept-voxel slot or -1.
void voxelize_level(const int32_t* coords, const uint8_t* valid, int n,
                    int cap, Level* out, int32_t* inverse,
                    int32_t* counts /* may be null */) {
    std::vector<std::pair<uint64_t, int32_t>> rows;
    rows.reserve(n);
    for (int i = 0; i < n; ++i) {
        if (!valid[i]) continue;
        const int32_t x = coords[i * 3], y = coords[i * 3 + 1],
                      z = coords[i * 3 + 2];
        if (x < 0 || x >= kShift || y < 0 || y >= kShift || z < 0 ||
            z >= kShift)
            continue;
        rows.emplace_back(pack_key(x, y, z), i);
    }
    // the loader delivers level-0 points voxel-key-sorted; skip the sort then
    bool sorted = true;
    for (size_t i = 1; i < rows.size(); ++i)
        if (rows[i - 1].first > rows[i].first) { sorted = false; break; }
    if (!sorted) std::sort(rows.begin(), rows.end());
    out->coords.clear();
    out->keys.clear();
    if (counts) std::memset(counts, 0, sizeof(int32_t) * (size_t)cap);
    for (int i = 0; i < n; ++i) inverse[i] = -1;
    int slot = -1;
    uint64_t prev = ~0ull;
    for (auto& r : rows) {
        if (r.first != prev) {
            prev = r.first;
            ++slot;
            if (slot < cap) {
                out->keys.push_back(r.first);
                const int32_t* c = coords + (size_t)r.second * 3;
                out->coords.insert(out->coords.end(), {c[0], c[1], c[2]});
            }
        }
        if (slot < cap) {
            inverse[r.second] = slot;
            if (counts) counts[slot] += 1;
        }
    }
    out->num = (int32_t)out->keys.size();
}

}  // namespace

// Build the full plan. Layout of flat output buffers (caller-allocated):
//   ranks:  sum_l cap_l * 9   int16 (sentinel = cap_l)
//   sel:    sum_l cap_l * 9   int8  (packed dz codes, 3 = invalid)
//   vvalid: sum_l cap_l       uint8
//   down:   sum_{l>=1} cap_l * 8   int16 (-1 miss)
//   f2c:    sum_{l>=1} cap_{l-1}   int16 (-1 invalid/overflow)
//   upoff:  sum_{l>=1} cap_{l-1}   int8
//   nums:   num_levels int32 (active voxels per level, pre-clamp diagnostics)
//   inverse: (n,) int32; counts: (cap_0,) int32
// Returns 0 on success, -1 on bad arguments.
int mopa_build_plan(const int32_t* coords, const uint8_t* valid, int n,
                    int num_levels, const int32_t* caps, int32_t* inverse,
                    int32_t* counts, int16_t* ranks, int8_t* sel,
                    uint8_t* vvalid, int16_t* down, int16_t* f2c,
                    int8_t* upoff, int32_t* nums) {
    if (n <= 0 || num_levels <= 0) return -1;
    for (int l = 0; l < num_levels; ++l)
        if (caps[l] <= 0 || caps[l] > 32767) return -1;  // int16 slot range

    Level cur;
    std::vector<int32_t> lvl_inverse((size_t)n);
    voxelize_level(coords, valid, n, caps[0], &cur, inverse, counts);

    size_t off9 = 0, off1 = 0, off8 = 0, offf = 0;
    std::vector<int32_t> nbr;  // (V, 27)

    for (int l = 0; l < num_levels; ++l) {
        const int cap = caps[l];
        const int v = cur.num;
        nums[l] = v;

        // valid mask
        for (int i = 0; i < cap; ++i) vvalid[off1 + i] = i < v ? 1 : 0;

        // exact 27-neighbour map via per-offset two-pointer merges: the
        // query stream key+delta of a sorted table is itself sorted, so each
        // offset is one linear co-scan (the CPU twin of the device-side
        // sort-merge; ~6x faster than hash lookups here)
        nbr.assign((size_t)cap * 27, -1);
        {
            int k = 0;
            for (int dx = -1; dx <= 1; ++dx)
                for (int dy = -1; dy <= 1; ++dy)
                    for (int dz = -1; dz <= 1; ++dz, ++k) {
                        const int64_t dkey = ((int64_t)dx << 24) +
                                             ((int64_t)dy << 12) + (int64_t)dz;
                        int j = 0;
                        for (int i = 0; i < v; ++i) {
                            // SIGNED compare: border queries can go negative
                            // (an unsigned wrap would strand the co-scan)
                            const int64_t q = (int64_t)cur.keys[i] + dkey;
                            while (j < v && (int64_t)cur.keys[j] < q) ++j;
                            if (j < v && (int64_t)cur.keys[j] == q) {
                                // key wraps at coordinate borders can false
                                // match — verify the coordinates
                                const int32_t qx = cur.coords[i * 3] + dx;
                                const int32_t qy = cur.coords[i * 3 + 1] + dy;
                                const int32_t qz = cur.coords[i * 3 + 2] + dz;
                                if (qx >= 0 && qx < kShift && qy >= 0 &&
                                    qy < kShift && qz >= 0 && qz < kShift)
                                    nbr[(size_t)i * 27 + k] = j;
                            }
                        }
                    }
        }

        // wide-column ranks/sel (matches sparse_conv.wide_from_nbr exactly)
        for (int i = 0; i < cap; ++i) {
            for (int c = 0; c < 9; ++c) {
                const int32_t s0 = nbr[(size_t)i * 27 + 3 * c];
                const int32_t s1 = nbr[(size_t)i * 27 + 3 * c + 1];
                const int32_t s2 = nbr[(size_t)i * 27 + 3 * c + 2];
                const bool e0 = s0 >= 0, e1 = s1 >= 0, e2 = s2 >= 0;
                const int32_t r = e0 ? s0 : (e1 ? s1 : (e2 ? s2 : cap));
                const int t0 = e0 ? 0 : (e1 ? 1 : (e2 ? 2 : 3));
                const int t1 = (e0 && e1) ? 1 : (((e0 || e1) && e2) ? 2 : 3);
                const int t2 = (e0 && e1 && e2) ? 2 : 3;
                ranks[off9 + (size_t)i * 9 + c] = (int16_t)r;
                sel[off9 + (size_t)i * 9 + c] =
                    (int8_t)(t0 | (t1 << 2) | (t2 << 4));
            }
        }
        off9 += (size_t)cap * 9;
        off1 += (size_t)cap;

        if (l + 1 < num_levels) {
            // downsample: halve kept coords, sorted-unique dedup
            const int ccap = caps[l + 1];
            std::vector<int32_t> half((size_t)cap * 3, 0);
            std::vector<uint8_t> hvalid((size_t)cap, 0);
            for (int i = 0; i < v; ++i) {
                // floor-div for non-negative coords
                half[(size_t)i * 3] = cur.coords[i * 3] >> 1;
                half[(size_t)i * 3 + 1] = cur.coords[i * 3 + 1] >> 1;
                half[(size_t)i * 3 + 2] = cur.coords[i * 3 + 2] >> 1;
                hvalid[i] = 1;
            }
            Level coarse;
            lvl_inverse.assign((size_t)cap, -1);
            voxelize_level(half.data(), hvalid.data(), cap, ccap, &coarse,
                           lvl_inverse.data(), nullptr);
            // f2c / up_off / down_nbr
            for (int i = 0; i < (int)((size_t)ccap * 8); ++i)
                down[off8 + i] = -1;
            for (int i = 0; i < cap; ++i) {
                const int32_t c = i < v ? lvl_inverse[i] : -1;
                f2c[offf + i] = (int16_t)c;
                int o = 0;
                if (i < v)
                    o = ((cur.coords[i * 3] & 1) << 2) |
                        ((cur.coords[i * 3 + 1] & 1) << 1) |
                        (cur.coords[i * 3 + 2] & 1);
                upoff[offf + i] = (int8_t)o;
                if (c >= 0) down[off8 + (size_t)c * 8 + o] = (int16_t)i;
            }
            off8 += (size_t)ccap * 8;
            offf += (size_t)cap;
            cur = std::move(coarse);
        }
    }
    return 0;
}

}  // extern "C"
