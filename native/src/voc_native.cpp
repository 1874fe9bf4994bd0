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
