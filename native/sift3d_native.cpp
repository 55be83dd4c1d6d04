// sift3d native runtime: fast .key feature-file serialization.
//
// TPU-native counterpart of the reference's native IO layer
// (msFeature3DVectorOutputText/InputText templates, src_common/
// MultiScale.h:228-474, and the vendored 7.5k-LoC C NIfTI reader): the
// device compute path is JAX/XLA, but host-side serialization of large
// feature sets (tens of thousands of 81-field text records) is C++ for
// throughput. Loaded from Python via ctypes (sift3d/io/native.py) with a
// pure-Python fallback.
//
// Build: g++ -O3 -fPIC -shared -o libsift3d_native.so sift3d_native.cpp

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cstdint>
#include <vector>
#include <string>

extern "C" {

// Write the reference text format (MultiScale.h:386-474). Returns the
// number of features written, or -1 on IO error.
// xyz:[n,3] scale:[n] ori:[n,9] eigs:[n,3] info:[n] desc:[n,64]
int s3d_write_key_text(const char *path, int n,
                       const float *xyz, const float *scale,
                       const float *ori, const float *eigs,
                       const uint32_t *info, const float *desc,
                       int n_comments, const char **comments,
                       float eig_thres) {
  FILE *f = fopen(path, "wt");
  if (!f) return -1;

  std::vector<int> keep;
  keep.reserve(n);
  for (int i = 0; i < n; i++) {
    if (eig_thres < 0) { keep.push_back(i); continue; }
    const float *e = eigs + 3 * i;
    float s = e[0] + e[1] + e[2];
    float p = e[0] * e[1] * e[2];
    if (s * s * s < eig_thres * p) keep.push_back(i);
  }

  fprintf(f, "# featExtract 1.1\n");
  for (int c = 0; c < n_comments; c++) fprintf(f, "# %s\n", comments[c]);
  fprintf(f, "Features: %d\n", (int)keep.size());
  fprintf(f,
          "Scale-space location[x y z scale] orientation[o11 o12 o13 o21 o22 "
          "o23 o31 o32 o32] 2nd moment eigenvalues[e1 e2 e3] info flag[i1] "
          "descriptor[d1 .. d64]\n");

  // one big buffered line per feature
  char line[4096];
  for (int ki = 0; ki < (int)keep.size(); ki++) {
    int i = keep[ki];
    int o = 0;
    o += snprintf(line + o, sizeof(line) - o, "%f\t%f\t%f\t%f\t",
                  xyz[3 * i], xyz[3 * i + 1], xyz[3 * i + 2], scale[i]);
    for (int j = 0; j < 9; j++)
      o += snprintf(line + o, sizeof(line) - o, "%f\t", ori[9 * i + j]);
    for (int j = 0; j < 3; j++)
      o += snprintf(line + o, sizeof(line) - o, "%f\t", eigs[3 * i + j]);
    o += snprintf(line + o, sizeof(line) - o, "%u\t", info[i]);
    for (int j = 0; j < 64; j++) {
      // (char) cast of the float value (MultiScale.h:467)
      int v = (int)(char)(long long)desc[64 * i + j];
      o += snprintf(line + o, sizeof(line) - o, "%i\t", v);
    }
    line[o++] = '\n';
    fwrite(line, 1, o, f);
  }
  fclose(f);
  return (int)keep.size();
}

// Count features in a .key text file (pass 1 of reading). Returns the
// declared feature count, or -1 on parse failure.
int s3d_key_count(const char *path) {
  FILE *f = fopen(path, "rt");
  if (!f) return -1;
  char buf[8192];
  int count = -1;
  while (fgets(buf, sizeof(buf), f)) {
    if (buf[0] == '#') continue;
    if (sscanf(buf, "Features: %d", &count) == 1) break;
    break;
  }
  fclose(f);
  return count;
}

// Read features (pass 2). Caller allocates arrays sized by s3d_key_count.
// Returns number of rows parsed, or -1 on error.
int s3d_read_key_text(const char *path, int n,
                      float *xyz, float *scale, float *ori, float *eigs,
                      uint32_t *info, float *desc) {
  FILE *f = fopen(path, "rt");
  if (!f) return -1;
  char buf[16384];
  // skip comments, Features line, legend line
  int declared = -1;
  while (fgets(buf, sizeof(buf), f)) {
    if (buf[0] == '#') continue;
    if (sscanf(buf, "Features: %d", &declared) == 1) break;
    fclose(f);
    return -1;
  }
  if (!fgets(buf, sizeof(buf), f)) { fclose(f); return -1; }
  if (!strstr(buf, "Scale-space location[x y z scale]")) { fclose(f); return -1; }

  int rows = 0;
  while (rows < n && fgets(buf, sizeof(buf), f)) {
    char *p = buf;
    char *end;
    // 16 leading floats: x y z scale + 9 ori + 3 eigs
    float vals[16];
    bool ok = true;
    for (int j = 0; j < 16; j++) {
      vals[j] = strtof(p, &end);
      if (end == p) { ok = false; break; }
      p = end;
    }
    if (!ok) break;
    xyz[3 * rows] = vals[0];
    xyz[3 * rows + 1] = vals[1];
    xyz[3 * rows + 2] = vals[2];
    scale[rows] = vals[3];
    memcpy(ori + 9 * rows, vals + 4, 9 * sizeof(float));
    memcpy(eigs + 3 * rows, vals + 13, 3 * sizeof(float));
    info[rows] = (uint32_t)strtoul(p, &end, 10);
    if (end == p) break;
    p = end;
    for (int j = 0; j < 64; j++) {
      desc[64 * rows + j] = strtof(p, &end);
      if (end == p) { ok = false; break; }
      p = end;
    }
    if (!ok) break;
    rows++;
  }
  fclose(f);
  return rows;
}

}  // extern "C"
