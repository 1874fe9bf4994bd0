// Native data-path kernels for objectdetection_ssd_tpu.
//
// The reference's ingestion is ~16.5k serial ElementTree XML parses at
// import time (Util.py:14-16, DataLists.py:85-94) and per-item PIL work in
// DataLoader workers (Dataset.py:24-39).  These C++ kernels remove the
// Python from both hot paths:
//   * voc_parse_xml: a single-pass scanner over a VOC annotation file's
//     bytes extracting (class_id, difficult, xmin/ymin/xmax/ymax - 1) per
//     <object>, with unknown class names skipped — the exact semantics of
//     the reference parser (DataLists.py:8-30).
//   * resize_bilinear_antialias + normalize: PIL-compatible triangle-filter
//     ("bilinear with antialias") resampling fused with ImageNet mean/std
//     normalization, so the native path is numerically interchangeable with
//     the torchvision Resize+Normalize the reference uses (Dataset.py:10-13).
//
// Exposed with plain C linkage for ctypes (no pybind11 in this image).

#include <algorithm>
#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

// VOC class vocabulary; index == class id (config.py VOC_CLASSES).
static const char* kClasses[20] = {
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat",
    "chair", "cow", "diningtable", "dog", "horse", "motorbike", "person",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor"};

int class_id(const std::string& name) {
  for (int i = 0; i < 20; ++i) {
    if (name == kClasses[i]) return i;
  }
  return -1;
}

// Find the text content of the first <tag>...</tag> inside [begin, end).
// Returns empty string when absent.
std::string tag_text(const char* data, size_t begin, size_t end,
                     const char* tag) {
  std::string open = std::string("<") + tag + ">";
  std::string close = std::string("</") + tag + ">";
  const char* base = data + begin;
  size_t span = end - begin;
  const char* o = static_cast<const char*>(
      memmem(base, span, open.data(), open.size()));
  if (!o) return "";
  const char* text = o + open.size();
  const char* c = static_cast<const char*>(
      memmem(text, data + end - text, close.data(), close.size()));
  if (!c) return "";
  std::string out(text, c - text);
  // trim + lowercase (reference: .lower().strip(), DataLists.py:15)
  size_t a = out.find_first_not_of(" \t\r\n");
  size_t b = out.find_last_not_of(" \t\r\n");
  if (a == std::string::npos) return "";
  out = out.substr(a, b - a + 1);
  for (auto& ch : out) ch = static_cast<char>(std::tolower(ch));
  return out;
}

}  // namespace

extern "C" {

// Parse VOC annotation XML bytes.  Writes up to `cap` objects into
// boxes (cap*4 floats, xyxy 0-indexed), classes (cap ints),
// difficult (cap bytes).  Returns the number of objects written, or -1 on
// malformed input.
int voc_parse_xml(const char* data, long len, float* boxes, int* classes,
                  unsigned char* difficult, int cap) {
  if (!data || len <= 0) return -1;
  int count = 0;
  size_t pos = 0;
  const std::string open = "<object>";
  const std::string close = "</object>";
  while (count < cap) {
    const char* o = static_cast<const char*>(
        memmem(data + pos, len - pos, open.data(), open.size()));
    if (!o) break;
    size_t obj_begin = (o - data) + open.size();
    const char* c = static_cast<const char*>(
        memmem(data + obj_begin, len - obj_begin, close.data(),
               close.size()));
    if (!c) break;
    size_t obj_end = c - data;
    pos = obj_end + close.size();

    std::string name = tag_text(data, obj_begin, obj_end, "name");
    int cid = class_id(name);
    if (cid < 0) continue;  // unknown label: skip (DataLists.py:17)

    std::string diff = tag_text(data, obj_begin, obj_end, "difficult");
    std::string xmin = tag_text(data, obj_begin, obj_end, "xmin");
    std::string ymin = tag_text(data, obj_begin, obj_end, "ymin");
    std::string xmax = tag_text(data, obj_begin, obj_end, "xmax");
    std::string ymax = tag_text(data, obj_begin, obj_end, "ymax");
    if (xmin.empty() || ymin.empty() || xmax.empty() || ymax.empty())
      continue;
    // int(float(.)) - 1: VOC is 1-indexed (DataLists.py:22-25)
    boxes[count * 4 + 0] = static_cast<float>(
        static_cast<long>(std::strtod(xmin.c_str(), nullptr)) - 1);
    boxes[count * 4 + 1] = static_cast<float>(
        static_cast<long>(std::strtod(ymin.c_str(), nullptr)) - 1);
    boxes[count * 4 + 2] = static_cast<float>(
        static_cast<long>(std::strtod(xmax.c_str(), nullptr)) - 1);
    boxes[count * 4 + 3] = static_cast<float>(
        static_cast<long>(std::strtod(ymax.c_str(), nullptr)) - 1);
    classes[count] = cid;
    difficult[count] = (diff == "1") ? 1 : 0;
    ++count;
  }
  return count;
}

// PIL-compatible separable triangle-filter resample (what PIL calls
// BILINEAR with antialias) of an HWC uint8/float32 image, one axis.
// support = max(1, in/out); each output pixel is the normalized triangle-
// weighted sum over its source window — identical math to PIL's
// ImagingResampleHorizontal/Vertical.
static void resample_axis(const float* src, int in_size, int other, int ch,
                          int src_stride_axis, int src_stride_other,
                          float* dst, int out_size) {
  double scale = static_cast<double>(in_size) / out_size;
  double support = (scale >= 1.0) ? scale : 1.0;

  std::vector<int> starts(out_size), sizes(out_size);
  std::vector<std::vector<float>> weights(out_size);
  for (int x = 0; x < out_size; ++x) {
    double center = (x + 0.5) * scale;
    int lo = static_cast<int>(std::max(center - support, 0.0));
    int hi = static_cast<int>(
        std::min(std::ceil(center + support), (double)in_size));
    starts[x] = lo;
    sizes[x] = hi - lo;
    weights[x].resize(hi - lo);
    double total = 0.0;
    for (int i = 0; i < hi - lo; ++i) {
      double d = (lo + i + 0.5 - center) / (support > 1.0 ? scale : 1.0);
      double w = (d < 0 ? d + 1.0 : 1.0 - d);
      if (w < 0) w = 0;
      weights[x][i] = static_cast<float>(w);
      total += w;
    }
    if (total > 0) {
      for (auto& w : weights[x]) w = static_cast<float>(w / total);
    }
  }

#pragma omp parallel for schedule(static)
  for (int y = 0; y < other; ++y) {
    for (int x = 0; x < out_size; ++x) {
      const float* wrow = weights[x].data();
      int lo = starts[x], n = sizes[x];
      for (int c = 0; c < ch; ++c) {
        float acc = 0.0f;
        const float* base =
            src + (size_t)y * src_stride_other + (size_t)lo * src_stride_axis
            + c;
        for (int i = 0; i < n; ++i) {
          acc += wrow[i] * base[(size_t)i * src_stride_axis];
        }
        dst[((size_t)y * out_size + x) * ch + c] = acc;
      }
    }
  }
}

// Resize (h, w, 3) float32 [0,1] -> (out, out, 3) with PIL-BILINEAR
// semantics, then normalize with mean/std per channel.
void resize_normalize(const float* src, int h, int w, float* dst, int out,
                      const float* mean, const float* stddev) {
  // Horizontal pass: (h, w, 3) -> (h, out, 3)
  std::vector<float> tmp((size_t)h * out * 3);
  resample_axis(src, w, h, 3, /*stride_axis=*/3, /*stride_other=*/(int)(w * 3),
                tmp.data(), out);
  // Vertical pass: (h, out, 3) -> (out, out, 3); axis is rows now.
  std::vector<float> tmp2((size_t)out * out * 3);
  resample_axis(tmp.data(), h, out, 3, /*stride_axis=*/(int)(out * 3),
                /*stride_other=*/3, tmp2.data(), out);
  // tmp2 is laid out transposed ((x, y) major) because the second pass
  // walked columns as "other"; fix layout while normalizing.
#pragma omp parallel for schedule(static)
  for (int y = 0; y < out; ++y) {
    for (int x = 0; x < out; ++x) {
      for (int c = 0; c < 3; ++c) {
        float v = tmp2[((size_t)x * out + y) * 3 + c];
        dst[((size_t)y * out + x) * 3 + c] = (v - mean[c]) / stddev[c];
      }
    }
  }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Full training augmentation pipeline in native code.
//
// Reproduces the reference's augmentation semantics (Util.py:566-607):
//   photometric distortions (brightness/contrast/saturation/hue, each p=0.5,
//   random order, factors U(0.5,1.5) / hue U(-18/255,18/255)), zoom-out
//   expand up to 4x onto an ImageNet-mean canvas (p=0.5), SSD min-IoU random
//   crop ({0,.1,.3,.5,.7,.9,skip} x 50 trials, scale U(0.3,1), AR (0.5,2),
//   center-inside box filter, clipping), horizontal flip p=0.5 with the
//   reference's x' = W - x - 1 column-swap math, then resize to the model
//   input size + ImageNet normalization.
//
// Design: expand+crop compose into a single *virtual window* over the
// original image (pixels outside the image are the ImageNet-mean filler), so
// the up-to-4x canvas is never materialized; the final triangle-filter
// resample reads straight from the source with bounds checks.  The RNG is
// std::mt19937_64 (NOT numpy's stream) — augmentation randomness only needs
// to be well-distributed and seed-deterministic, not bit-equal to Python.

#include <random>

namespace {

struct Window {          // crop window in source-image coordinates
  long x1, y1, x2, y2;   // may extend outside [0,w) x [0,h): filler region
};

// Precomputed triangle-filter taps for resampling one axis of a virtual
// window [win_lo, win_lo + win_size) down/up to out_size, where source
// indices outside [0, src_size) contribute the filler color.  Computed ONCE
// per axis and reused across every line — the earlier per-row weight
// rebuild (with per-output heap allocations) dominated the augmentation
// cost (~18 ms/image; see benchmarks/RESULTS.md round 3).
struct AxisPlan {
  std::vector<float> fill_w;    // (out) total filler weight per output
  std::vector<int> tap_start;   // (out+1) prefix offsets into taps
  std::vector<int> tap_src;     // flattened ABSOLUTE source indices
  std::vector<float> tap_w;     // flattened normalized weights
  long src_lo = 0, src_hi = 0;  // [src_lo, src_hi) = source range touched
};

AxisPlan make_axis_plan(long win_lo, long win_size, long src_size,
                        long out_size) {
  double scale = static_cast<double>(win_size) / out_size;
  double support = (scale >= 1.0) ? scale : 1.0;
  AxisPlan p;
  p.fill_w.assign(out_size, 0.0f);
  p.tap_start.assign(out_size + 1, 0);
  p.src_lo = src_size;
  p.src_hi = 0;
  std::vector<double> w;
  for (long x = 0; x < out_size; ++x) {
    double center = (x + 0.5) * scale;
    long lo = static_cast<long>(std::max(center - support, 0.0));
    long hi = static_cast<long>(
        std::min(std::ceil(center + support), (double)win_size));
    w.assign(hi - lo, 0.0);
    double total = 0.0;
    for (long i = 0; i < hi - lo; ++i) {
      double d = (lo + i + 0.5 - center) / (support > 1.0 ? scale : 1.0);
      double ww = (d < 0 ? d + 1.0 : 1.0 - d);
      if (ww < 0) ww = 0;
      w[i] = ww;
      total += ww;
    }
    double fill = 0.0;
    for (long i = 0; i < hi - lo; ++i) {
      double ww = total > 0 ? w[i] / total : 0.0;
      long s = win_lo + lo + i;
      if (s >= 0 && s < src_size) {
        p.tap_src.push_back(static_cast<int>(s));
        p.tap_w.push_back(static_cast<float>(ww));
        p.src_lo = std::min(p.src_lo, s);
        p.src_hi = std::max(p.src_hi, s + 1);
      } else {
        fill += ww;
      }
    }
    p.fill_w[x] = static_cast<float>(fill);
    p.tap_start[x + 1] = static_cast<int>(p.tap_src.size());
  }
  if (p.src_hi < p.src_lo) p.src_lo = p.src_hi = 0;
  return p;
}

// One drawn photometric distortion (Util.py:752-780).  op: 0=brightness,
// 1=contrast (mean filled in later — it depends on the ops before it),
// 2=saturation, 3=hue; f: blend factor or hue delta.
struct PhotoOp {
  int op;
  float f;
  float mean;
};

// Hue rotation of one RGB pixel by delta turns (sector-switch HSV
// round-trip).  A branchless k = fmod(n + 6h, 6) formulation measured no
// faster (within host noise) — the extra floor/fmod flops offset the
// eliminated branches on this scalar layout — so the simpler form stays.
inline void hue_shift_px(float* rgb, float delta) {
  float r = rgb[0], g = rgb[1], b = rgb[2];
  float mx = std::max(r, std::max(g, b));
  float mn = std::min(r, std::min(g, b));
  float span = mx - mn;
  float s = mx > 0 ? span / mx : 0.0f;
  float hh = 0.0f;
  if (span > 0) {
    if (mx == r) hh = (g - b) / span;
    else if (mx == g) hh = 2.0f + (b - r) / span;
    else hh = 4.0f + (r - g) / span;
  }
  hh = hh / 6.0f;
  hh -= std::floor(hh);
  hh += delta;
  hh -= std::floor(hh);
  float v6 = hh * 6.0f;
  int sector = (int)v6 % 6;
  float f = v6 - std::floor(v6);
  float p = mx * (1 - s), q = mx * (1 - s * f),
        t = mx * (1 - s * (1 - f));
  switch (sector) {
    case 0: rgb[0] = mx; rgb[1] = t; rgb[2] = p; break;
    case 1: rgb[0] = q; rgb[1] = mx; rgb[2] = p; break;
    case 2: rgb[0] = p; rgb[1] = mx; rgb[2] = t; break;
    case 3: rgb[0] = p; rgb[1] = q; rgb[2] = mx; break;
    case 4: rgb[0] = t; rgb[1] = p; rgb[2] = mx; break;
    default: rgb[0] = mx; rgb[1] = p; rgb[2] = q; break;
  }
}

// Apply the first n ops of the plan to one RGB pixel, in order, with the
// same per-op clipping the eager full-image passes used — the composition
// per pixel is bit-identical to materializing each op over the whole
// image.
inline void apply_photo_ops(const PhotoOp* ops, int n, float* rgb) {
  for (int i = 0; i < n; ++i) {
    const PhotoOp& o = ops[i];
    if (o.op == 0) {                      // brightness
      for (int c = 0; c < 3; ++c)
        rgb[c] = std::min(std::max(rgb[c] * o.f, 0.0f), 1.0f);
    } else if (o.op == 1) {               // contrast (blend with gray mean)
      for (int c = 0; c < 3; ++c)
        rgb[c] = std::min(
            std::max(o.f * rgb[c] + (1 - o.f) * o.mean, 0.0f), 1.0f);
    } else if (o.op == 2) {               // saturation (blend with gray)
      float g = 0.299f * rgb[0] + 0.587f * rgb[1] + 0.114f * rgb[2];
      for (int c = 0; c < 3; ++c)
        rgb[c] = std::min(std::max(o.f * rgb[c] + (1 - o.f) * g, 0.0f),
                          1.0f);
    } else {                              // hue shift (RGB->HSV->RGB)
      hue_shift_px(rgb, o.f);
    }
  }
}

float iou_1v1(const float* a, const float* b) {
  float ix = std::min(a[2], b[2]) - std::max(a[0], b[0]);
  float iy = std::min(a[3], b[3]) - std::max(a[1], b[1]);
  if (ix <= 0 || iy <= 0) return 0.0f;
  float inter = ix * iy;
  float aa = (a[2] - a[0]) * (a[3] - a[1]);
  float ab = (b[2] - b[0]) * (b[3] - b[1]);
  return inter / (aa + ab - inter);
}

}  // namespace

extern "C" {

// Full train-time augmentation of one example.
//   img:    (h, w, 3) float32 RGB in [0, 1]
//   boxes:  (n, 4) float32 absolute-pixel xyxy; labels: (n,) int32
//   seed:   RNG seed (deterministic per example)
//   out:    (out_size, out_size, 3) float32, ImageNet-normalized
//   out_boxes: (n, 4) float32 xyxy normalized to [0, 1]
//   fill3: expand/crop filler color (ImageNet mean, un-normalized)
//   mean3/std3: output normalization constants (pass 0/1 for raw [0,1]
//   output, e.g. when quantizing to uint8 for device-side normalization)
// Returns the number of surviving boxes (<= n), or -1 on error.
int train_augment(const float* img, long h, long w, const float* boxes,
                  const int* labels, int n, unsigned long long seed,
                  long out_size, const float* fill3, const float* mean3,
                  const float* std3, float* out_img, float* out_boxes,
                  int* out_labels) {
  if (!img || h <= 0 || w <= 0 || out_size <= 0) return -1;
  std::mt19937_64 rng(seed);
  auto uniform = [&](double a, double b) {
    return std::uniform_real_distribution<double>(a, b)(rng);
  };
  auto randint = [&](long a, long b) {  // inclusive [a, b]
    return std::uniform_int_distribution<long>(a, b)(rng);
  };

  // ---- photometric distortions (Util.py:752-780) -------------------------
  // DRAWN here (same rng call order as applying eagerly), APPLIED later —
  // only to the pixels the resample actually reads: after an expand+crop
  // the window often covers a fraction of the source, and the per-pixel
  // op chain composes to the bit-identical result either way.  Contrast's
  // gray mean still spans the FULL image (reference semantics: photometric
  // runs before expand/crop); it is computed in a read-only pass below
  // once the plan is known.
  PhotoOp photo[4];
  int n_photo = 0;
  int order[4] = {0, 1, 2, 3};
  std::shuffle(order, order + 4, rng);
  for (int oi = 0; oi < 4; ++oi) {
    if (uniform(0.0, 1.0) >= 0.5) continue;
    int op = order[oi];
    float f = (op == 3) ? (float)uniform(-18.0 / 255.0, 18.0 / 255.0)
                        : (float)uniform(0.5, 1.5);
    photo[n_photo++] = PhotoOp{op, f, 0.0f};
  }

  // Working box set (source-pixel coords; virtual-canvas offset applied via
  // the crop window instead of moving boxes).
  std::vector<float> wb(boxes, boxes + (size_t)n * 4);
  std::vector<int> wl(labels, labels + n);

  // ---- expand (virtual canvas; Util.py:610-645), p = 0.5 -----------------
  // canvas size (ch_, cw_); image placed at (left, top).  Instead of
  // shifting boxes, remember the canvas->source offset.
  long cw_ = w, ch_ = h, left = 0, top = 0;
  if (uniform(0.0, 1.0) < 0.5) {
    double scale = uniform(1.0, 4.0);
    ch_ = (long)(scale * h);
    cw_ = (long)(scale * w);
    left = randint(0, cw_ - w);
    top = randint(0, ch_ - h);
  }

  // ---- random crop in canvas coords (Util.py:648-729) --------------------
  static const double kOverlaps[7] = {0.0, 0.1, 0.3, 0.5, 0.7, 0.9, -1.0};
  Window win{0, 0, cw_, ch_};   // default: whole canvas
  bool done = false;
  while (!done) {
    double min_overlap = kOverlaps[randint(0, 6)];
    if (min_overlap < 0) break;                  // no cropping
    for (int trial = 0; trial < 50 && !done; ++trial) {
      double sh_ = uniform(0.3, 1.0), sw_ = uniform(0.3, 1.0);
      long nh = (long)(sh_ * ch_), nw = (long)(sw_ * cw_);
      if (nw <= 0 || nh <= 0) continue;
      double ar = (double)nh / nw;
      if (!(0.5 < ar && ar < 2.0)) continue;
      long cl = randint(0, cw_ - nw), ct = randint(0, ch_ - nh);
      float crop[4] = {(float)(cl - left), (float)(ct - top),
                       (float)(cl - left + nw), (float)(ct - top + nh)};
      if (n > 0) {
        float best = 0.0f;
        for (int i = 0; i < n; ++i)
          best = std::max(best, iou_1v1(crop, &wb[i * 4]));
        if (best < min_overlap) continue;
        // keep boxes whose centers lie inside the crop
        std::vector<float> kb; std::vector<int> kl;
        for (int i = 0; i < (int)wl.size(); ++i) {
          float cx = (wb[i * 4] + wb[i * 4 + 2]) / 2;
          float cy = (wb[i * 4 + 1] + wb[i * 4 + 3]) / 2;
          if (cx > crop[0] && cx < crop[2] && cy > crop[1] && cy < crop[3]) {
            kb.push_back(std::max(wb[i * 4], crop[0]) - crop[0]);
            kb.push_back(std::max(wb[i * 4 + 1], crop[1]) - crop[1]);
            kb.push_back(std::min(wb[i * 4 + 2], crop[2]) - crop[0]);
            kb.push_back(std::min(wb[i * 4 + 3], crop[3]) - crop[1]);
            kl.push_back(wl[i]);
          }
        }
        if (kl.empty()) continue;
        wb = kb; wl = kl;
      }
      win = Window{cl - left, ct - top, cl - left + nw, ct - top + nh};
      done = true;
    }
    // after the crop, box coords are window-relative
    if (done) { left = 0; top = 0; }
  }
  if (!done && (left != 0 || top != 0)) {
    // expand happened but crop chose "no cropping": window = whole canvas,
    // boxes shift by the placement offset.
    win = Window{-left, -top, cw_ - left, ch_ - top};
    for (size_t i = 0; i < wb.size(); i += 4) { /* boxes stay source-rel */ }
    // make boxes window-relative: + (left, top)
    for (size_t i = 0; i < wl.size(); ++i) {
      wb[i * 4] += left; wb[i * 4 + 1] += top;
      wb[i * 4 + 2] += left; wb[i * 4 + 3] += top;
    }
  }

  long win_w = win.x2 - win.x1, win_h = win.y2 - win.y1;

  // ---- horizontal flip, p = 0.5 (Util.py:732-748) ------------------------
  bool flip = uniform(0.0, 1.0) < 0.5;
  if (flip) {
    for (size_t i = 0; i < wl.size(); ++i) {
      float x1 = wb[i * 4], x2 = wb[i * 4 + 2];
      wb[i * 4] = win_w - x2 - 1;
      wb[i * 4 + 2] = win_w - x1 - 1;
    }
  }

  // ---- resample window -> out_size, + normalize --------------------------
  // Two separable passes with PRECOMPUTED tap plans.  The horizontal pass
  // only touches the source rows the vertical taps actually read (a 4x
  // expand window is mostly filler rows — skipping them plus reusing the
  // weights cut this stage ~10x; see benchmarks/RESULTS.md round 3).
  // Filler (out-of-image) contributions fold in as a per-output weight on
  // the ImageNet-mean color; the vertical pass fuses flip + normalize and
  // writes the final HWC output directly.
  AxisPlan hp = make_axis_plan(win.x1, win_w, w, out_size);
  AxisPlan vp = make_axis_plan(win.y1, win_h, h, out_size);
  long row_lo = vp.src_lo, nrows = vp.src_hi - vp.src_lo;
  long col_lo = hp.src_lo, ncols = hp.src_hi - hp.src_lo;

  // Contrast gray mean over the FULL image through the ops before it
  // (reference semantics: photometric runs before expand/crop, so the mean
  // spans the whole image even when only a window survives).  Read-only;
  // at most one contrast per plan; the common case (contrast first) is a
  // tight vectorizable gray reduction.
  for (int i = 0; i < n_photo; ++i) {
    if (photo[i].op != 1) continue;
    double sum = 0.0;
    if (i == 0) {
#pragma omp parallel for reduction(+:sum) schedule(static)
      for (long px = 0; px < h * w; ++px)
        sum += 0.299 * img[px * 3] + 0.587 * img[px * 3 + 1] +
               0.114 * img[px * 3 + 2];
    } else {
#pragma omp parallel for reduction(+:sum) schedule(static)
      for (long px = 0; px < h * w; ++px) {
        float rgb[3] = {img[px * 3], img[px * 3 + 1], img[px * 3 + 2]};
        apply_photo_ops(photo, i, rgb);
        sum += 0.299 * rgb[0] + 0.587 * rgb[1] + 0.114 * rgb[2];
      }
    }
    photo[i].mean = (float)(sum / (h * w));
  }

  // Copy ONLY the window-visible region, then apply the ops as separate
  // tight passes over it — per-op loops auto-vectorize; a fused per-pixel
  // chain measured SLOWER than the eager full-image version (branchy
  // dispatch defeats SIMD; see RESULTS.md r3).
  std::vector<float> pbuf((size_t)std::max(nrows, 0L) *
                          std::max(ncols, 0L) * 3);
#pragma omp parallel for schedule(static)
  for (long r = 0; r < nrows; ++r) {
    std::memcpy(pbuf.data() + (size_t)r * ncols * 3,
                img + ((size_t)(row_lo + r) * w + col_lo) * 3,
                (size_t)ncols * 3 * sizeof(float));
  }
  const long npix = std::max(nrows, 0L) * std::max(ncols, 0L);
  for (int i = 0; i < n_photo; ++i) {
    const PhotoOp& o = photo[i];
    float f = o.f;
    float* pb = pbuf.data();
    if (o.op == 0) {                      // brightness
#pragma omp parallel for schedule(static)
      for (long j = 0; j < npix * 3; ++j)
        pb[j] = std::min(std::max(pb[j] * f, 0.0f), 1.0f);
    } else if (o.op == 1) {               // contrast
      float m = o.mean;
#pragma omp parallel for schedule(static)
      for (long j = 0; j < npix * 3; ++j)
        pb[j] = std::min(std::max(f * pb[j] + (1 - f) * m, 0.0f), 1.0f);
    } else if (o.op == 2) {               // saturation
#pragma omp parallel for schedule(static)
      for (long j = 0; j < npix; ++j) {
        float g = 0.299f * pb[j * 3] + 0.587f * pb[j * 3 + 1] +
                  0.114f * pb[j * 3 + 2];
        for (int c = 0; c < 3; ++c) {
          float v = f * pb[j * 3 + c] + (1 - f) * g;
          pb[j * 3 + c] = std::min(std::max(v, 0.0f), 1.0f);
        }
      }
    } else {                              // hue (branchless -> vectorizes)
#pragma omp parallel for schedule(static)
      for (long j = 0; j < npix; ++j)
        hue_shift_px(pb + j * 3, f);
    }
  }

  std::vector<float> tmp((size_t)std::max(nrows, 0L) * out_size * 3);
#pragma omp parallel for schedule(static)
  for (long r = 0; r < nrows; ++r) {
    const float* srow = pbuf.data() + (size_t)r * ncols * 3;
    float* drow = tmp.data() + (size_t)r * out_size * 3;
    for (long x = 0; x < out_size; ++x) {
      float fw = hp.fill_w[x];
      float a0 = fw * fill3[0], a1 = fw * fill3[1], a2 = fw * fill3[2];
      for (int t = hp.tap_start[x]; t < hp.tap_start[x + 1]; ++t) {
        const float* px = srow + (size_t)(hp.tap_src[t] - col_lo) * 3;
        float wt = hp.tap_w[t];
        a0 += wt * px[0];
        a1 += wt * px[1];
        a2 += wt * px[2];
      }
      drow[x * 3 + 0] = a0;
      drow[x * 3 + 1] = a1;
      drow[x * 3 + 2] = a2;
    }
  }

  const float inv_std[3] = {1.0f / std3[0], 1.0f / std3[1], 1.0f / std3[2]};
#pragma omp parallel for schedule(static)
  for (long y = 0; y < out_size; ++y) {
    float fw = vp.fill_w[y];
    std::vector<float> acc((size_t)out_size * 3);
    for (long x = 0; x < out_size; ++x) {
      acc[x * 3 + 0] = fw * fill3[0];
      acc[x * 3 + 1] = fw * fill3[1];
      acc[x * 3 + 2] = fw * fill3[2];
    }
    for (int t = vp.tap_start[y]; t < vp.tap_start[y + 1]; ++t) {
      const float* trow = tmp.data()
          + (size_t)(vp.tap_src[t] - row_lo) * out_size * 3;
      float wt = vp.tap_w[t];
      for (long i = 0; i < out_size * 3; ++i) acc[i] += wt * trow[i];
    }
    float* orow = out_img + (size_t)y * out_size * 3;
    for (long x = 0; x < out_size; ++x) {
      long sx = flip ? (out_size - 1 - x) : x;
      for (int c = 0; c < 3; ++c) {
        orow[x * 3 + c] = (acc[sx * 3 + c] - mean3[c]) * inv_std[c];
      }
    }
  }

  // ---- boxes: clip to window, normalize ----------------------------------
  int n_out = (int)wl.size();
  for (int i = 0; i < n_out; ++i) {
    float x1 = std::min(std::max(wb[i * 4], 0.0f), (float)win_w);
    float y1 = std::min(std::max(wb[i * 4 + 1], 0.0f), (float)win_h);
    float x2 = std::min(std::max(wb[i * 4 + 2], 0.0f), (float)win_w);
    float y2 = std::min(std::max(wb[i * 4 + 3], 0.0f), (float)win_h);
    out_boxes[i * 4] = x1 / win_w;
    out_boxes[i * 4 + 1] = y1 / win_h;
    out_boxes[i * 4 + 2] = x2 / win_w;
    out_boxes[i * 4 + 3] = y2 / win_h;
    out_labels[i] = wl[i];
  }
  return n_out;
}

}  // extern "C"
