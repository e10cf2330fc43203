// Native host-side kernels for lisec-tpu (SURVEY.md §2.3 note: the
// reference class implements its data-path hot loops in C++/CUDA; the
// TPU compute path is JAX/XLA/Pallas, but the HOST data path — point
// cloud IO, augmentation geometry, rotated-box membership for
// GT-sampling — is native here too so a single-core host can keep a
// chip fed).
//
// Plain C ABI, loaded via ctypes (no pybind11 in this image). All
// point buffers are float32 row-major [n, c] with xyz in the first 3
// channels.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>

extern "C" {

// Read a KITTI velodyne .bin (float32 x,y,z,intensity). Returns the
// number of points read (<= max_points), or -1 on IO error.
long ln_read_velodyne(const char* path, float* out, long max_points) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  long n = (long)std::fread(out, sizeof(float) * 4, (size_t)max_points, f);
  std::fclose(f);
  return n;
}

// In-place similarity transform of xyz: p <- R * p * scale + t.
// rot is row-major 3x3.
void ln_transform(float* pts, long n, long stride, const float* rot,
                  float scale, const float* trans) {
  for (long i = 0; i < n; ++i) {
    float* p = pts + i * stride;
    const float x = p[0], y = p[1], z = p[2];
    p[0] = (rot[0] * x + rot[1] * y + rot[2] * z) * scale + trans[0];
    p[1] = (rot[3] * x + rot[4] * y + rot[5] * z) * scale + trans[1];
    p[2] = (rot[6] * x + rot[7] * y + rot[8] * z) * scale + trans[2];
  }
}

// In-place flip over the x-z plane (y -> -y).
void ln_flip_y(float* pts, long n, long stride) {
  for (long i = 0; i < n; ++i) pts[i * stride + 1] = -pts[i * stride + 1];
}

// Membership of points in rotated 3D boxes (O14, host variant).
// boxes: [b, 7] = (cx, cy, cz, l, w, h, yaw). out: [n] uint8 holding
// the index+1 of the FIRST containing box (0 = none) — enough for the
// augmentation use (disjoint boxes); full masks stay in the jnp op.
void ln_points_in_rbbox_first(const float* pts, long n, long stride,
                              const float* boxes, long b, int32_t* out) {
  for (long i = 0; i < n; ++i) {
    const float x = pts[i * stride], y = pts[i * stride + 1],
                z = pts[i * stride + 2];
    out[i] = 0;
    for (long j = 0; j < b; ++j) {
      const float* bx = boxes + j * 7;
      const float dz = z - bx[2];
      if (std::fabs(dz) > bx[5] * 0.5f) continue;
      const float c = std::cos(bx[6]), s = std::sin(bx[6]);
      const float dx = x - bx[0], dy = y - bx[1];
      const float lx = dx * c + dy * s;
      if (std::fabs(lx) > bx[3] * 0.5f) continue;
      const float ly = -dx * s + dy * c;
      if (std::fabs(ly) > bx[4] * 0.5f) continue;
      out[i] = (int32_t)(j + 1);
      break;
    }
  }
}

// Per-box rigid motion applied to member points: for each point whose
// membership index (1-based, from ln_points_in_rbbox_first) is m>0,
// rotate about that box's center by dyaw[m-1] and translate by
// dtrans[m-1]. Used by the per-box noise augmentation (D5).
void ln_perturb_boxes(float* pts, long n, long stride,
                      const int32_t* member, const float* centers,
                      const float* dyaw, const float* dtrans, long b) {
  for (long i = 0; i < n; ++i) {
    const int32_t m = member[i];
    if (m <= 0 || m > b) continue;
    const float* ctr = centers + (m - 1) * 3;
    const float a = dyaw[m - 1];
    const float c = std::cos(a), s = std::sin(a);
    float* p = pts + i * stride;
    const float dx = p[0] - ctr[0], dy = p[1] - ctr[1];
    p[0] = ctr[0] + dx * c - dy * s + dtrans[(m - 1) * 3];
    p[1] = ctr[1] + dx * s + dy * c + dtrans[(m - 1) * 3 + 1];
    p[2] += dtrans[(m - 1) * 3 + 2];
  }
}

// Pad/truncate a cloud into a fixed budget + validity mask (D7).
void ln_pad_points(const float* src, long n, long c, float* dst,
                   uint8_t* mask, long max_points) {
  const long keep = n < max_points ? n : max_points;
  std::memcpy(dst, src, sizeof(float) * (size_t)(keep * c));
  std::memset(dst + keep * c, 0,
              sizeof(float) * (size_t)((max_points - keep) * c));
  std::memset(mask, 1, (size_t)keep);
  std::memset(mask + keep, 0, (size_t)(max_points - keep));
}

// Crop points to an axis-aligned range [min, max) on xyz, compacting
// in place. Returns the new count.
long ln_crop_range(float* pts, long n, long stride, const float* lo,
                   const float* hi) {
  long w = 0;
  for (long i = 0; i < n; ++i) {
    const float* p = pts + i * stride;
    if (p[0] >= lo[0] && p[0] < hi[0] && p[1] >= lo[1] && p[1] < hi[1] &&
        p[2] >= lo[2] && p[2] < hi[2]) {
      if (w != i)
        std::memmove(pts + w * stride, p, sizeof(float) * (size_t)stride);
      ++w;
    }
  }
  return w;
}

}  // extern "C"
