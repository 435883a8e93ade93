// Native ray-table builder for the monocular scene loader.
//
// The reference assembles its per-frame ray buffers in torch on the host
// (datasets/monocular.py:137-184). Our host pipeline does the same work
// once per scene; this C++ kernel performs the per-pixel geometry — camera
// ray directions (no +0.5 centering, ray_utils.py:7-36), world-space rays
// (ray_utils.py:39-59), the NDC projection with near-plane origin shift
// (ray_utils.py:62-106) — and packs the 16-channel table row
// [o(3) d(3) rgb(3) t disp mask uv+flow_fw(2) uv+flow_bw(2)]
// in a single pass over the image, removing Python/JAX dispatch overhead
// from scene loading.
//
// Built as a plain shared library, bound via ctypes
// (nsff_pl_tpu/scene/native.py). No external dependencies.

#include <cmath>
#include <cstdint>

extern "C" {

// K: 3x3 row-major; c2w: 3x4 row-major.
// img: H*W*3, disp: H*W, mask: H*W, flow_fw/flow_bw: H*W*2 (may be null).
// out: H*W*16.
void build_frame_rays(const float* K, const float* c2w, const float* img,
                      const float* disp, const float* mask,
                      const float* flow_fw, const float* flow_bw,
                      int W, int H, float t, float near_plane,
                      float shift_near, float* out) {
  const float fx = K[0], cx = K[2], fy = K[4], cy = K[5];
  // rotation columns of c2w (camera axes in world coords)
  const float r00 = c2w[0], r01 = c2w[1], r02 = c2w[2], tx = c2w[3];
  const float r10 = c2w[4], r11 = c2w[5], r12 = c2w[6], ty = c2w[7];
  const float r20 = c2w[8], r21 = c2w[9], r22 = c2w[10], tz = c2w[11];

  for (int j = 0; j < H; ++j) {
    for (int i = 0; i < W; ++i) {
      const int p = j * W + i;
      float* row = out + (int64_t)p * 16;

      // camera-space direction: ((i-cx)/fx, -(j-cy)/fy, -1)
      const float dcx = (i - cx) / fx;
      const float dcy = -(j - cy) / fy;
      const float dcz = -1.0f;

      // world-space direction = R * d, normalized
      float dx = r00 * dcx + r01 * dcy + r02 * dcz;
      float dy = r10 * dcx + r11 * dcy + r12 * dcz;
      float dz = r20 * dcx + r21 * dcy + r22 * dcz;
      const float inv_n = 1.0f / std::sqrt(dx * dx + dy * dy + dz * dz);
      dx *= inv_n;
      dy *= inv_n;
      dz *= inv_n;

      // origin = camera center, shifted to the near plane
      const float tt = -(shift_near + tz) / dz;
      float ox = tx + tt * dx;
      float oy = ty + tt * dy;
      float oz = tz + tt * dz;

      // NDC projection (ray_utils.py:84-106)
      const float ox_oz = ox / oz;
      const float oy_oz = oy / oz;
      const float o0 = -(fx / cx) * ox_oz;
      const float o1 = -(fy / cy) * oy_oz;
      const float o2 = 1.0f + 2.0f * near_plane / oz;
      const float d0 = -(fx / cx) * (dx / dz - ox_oz);
      const float d1 = -(fy / cy) * (dy / dz - oy_oz);
      const float d2 = 1.0f - o2;

      row[0] = o0;
      row[1] = o1;
      row[2] = o2;
      row[3] = d0;
      row[4] = d1;
      row[5] = d2;
      row[6] = img[3 * p + 0];
      row[7] = img[3 * p + 1];
      row[8] = img[3 * p + 2];
      row[9] = t;
      row[10] = disp[p];
      row[11] = mask[p];
      const float u = (float)i;
      const float v = (float)j;
      row[12] = u + (flow_fw ? flow_fw[2 * p + 0] : 0.0f);
      row[13] = v + (flow_fw ? flow_fw[2 * p + 1] : 0.0f);
      row[14] = u + (flow_bw ? flow_bw[2 * p + 0] : 0.0f);
      row[15] = v + (flow_bw ? flow_bw[2 * p + 1] : 0.0f);
    }
  }
}

// Middlebury .flo payload -> (H, W, 2); validates magic. Returns 0 on
// success, -1 on bad magic (mirrors flowlib.py:297-317).
int parse_flo(const uint8_t* buf, int64_t n_bytes, float* out,
              int* out_w, int* out_h) {
  if (n_bytes < 12) return -1;
  float magic;
  __builtin_memcpy(&magic, buf, 4);
  if (magic != 202021.25f) return -1;
  int32_t w, h;
  __builtin_memcpy(&w, buf + 4, 4);
  __builtin_memcpy(&h, buf + 8, 4);
  if ((int64_t)12 + (int64_t)8 * w * h > n_bytes) return -1;
  __builtin_memcpy(out, buf + 12, (size_t)8 * w * h);
  *out_w = w;
  *out_h = h;
  return 0;
}

}  // extern "C"
