/* Native MV-sidecar rasterizer — the data loader's host-side hot loop.
 *
 * Semantics identical to pnp_vcve_tpu/data/mv_raster.py (which mirrors the
 * reference loader, mmedit/datasets/pipelines/loading_ipb.py:137-185):
 * sequential per-record rectangle writes (later records overwrite earlier),
 * motion divided by scale, P-frame reversal scattered into a previous
 * frame's backward channels at the matched block location, partition
 * one-hot by block area (256/128/64 -> channel 0/1/2) or the single-channel
 * 255/area*64 variant.
 *
 * Exposed via ctypes (see native/__init__.py); a python/numpy fallback with
 * the same semantics stays authoritative for tests.
 */

#include <stdint.h>

static void clamp_range(int lo, int hi, int n, int *out_lo, int *out_hi) {
    /* python slice semantics: negative start wraps; here the reference's
     * computed starts are never < -(n) in practice, so emulate numpy's
     * a[lo:hi] for possibly-negative lo (wraps) like CPython slices on
     * ndarray: negative indices add n. */
    if (lo < 0) lo += n;
    if (hi < 0) hi += n;
    if (lo < 0) lo = 0;
    if (hi > n) hi = n;
    *out_lo = lo;
    *out_hi = hi;
}

void rasterize_frame(
    const float *records, long n_records,
    long height, long width,
    int is_b_frame,
    float *mv,          /* (h, w, 4), zero-initialised by caller */
    float *partition,   /* (h, w, par_ch) or NULL */
    int par_ch,         /* 3 (drconv one-hot) or 1 (255/area*64) */
    float *prev_mv      /* (h, w, 4) target for P-frame reversal, or NULL */
) {
    for (long r = 0; r < n_records; r++) {
        const float *rec = records + r * 10;
        float direction = rec[0];
        int w = (int)rec[1];
        int h = (int)rec[2];
        int x_w = (int)rec[3];
        int y_w = (int)rec[4];
        int x = (int)rec[5];
        int y = (int)rec[6];
        float scale = rec[9];
        float motion_x = rec[7] / scale;
        float motion_y = rec[8] / scale;

        int y0, y1, x0, x1;
        clamp_range(y - h / 2, y + h / 2, (int)height, &y0, &y1);
        clamp_range(x - w / 2, x + w / 2, (int)width, &x0, &x1);

        if (direction < 0.f) {
            for (int yy = y0; yy < y1; yy++)
                for (int xx = x0; xx < x1; xx++) {
                    float *p = mv + (yy * width + xx) * 4;
                    p[0] = motion_x;
                    p[1] = motion_y;
                }
        } else if (is_b_frame) {
            for (int yy = y0; yy < y1; yy++)
                for (int xx = x0; xx < x1; xx++) {
                    float *p = mv + (yy * width + xx) * 4;
                    p[2] = motion_x;
                    p[3] = motion_y;
                }
        } else if (prev_mv) {
            int wy0, wy1, wx0, wx1;
            clamp_range(y_w - h / 2, y_w + h / 2, (int)height, &wy0, &wy1);
            clamp_range(x_w - w / 2, x_w + w / 2, (int)width, &wx0, &wx1);
            for (int yy = wy0; yy < wy1; yy++)
                for (int xx = wx0; xx < wx1; xx++) {
                    float *p = prev_mv + (yy * width + xx) * 4;
                    p[2] = -motion_x;
                    p[3] = -motion_y;
                }
        }

        if (partition) {
            if (par_ch == 3) {
                int area = w * h;
                int ch = area == 256 ? 0 : (area == 128 ? 1 : 2);
                for (int yy = y0; yy < y1; yy++)
                    for (int xx = x0; xx < x1; xx++)
                        partition[(yy * width + xx) * 3 + ch] = 1.0f;
            } else {
                float v = 255.0f / (float)(w * h) * 64.0f;
                for (int yy = y0; yy < y1; yy++)
                    for (int xx = x0; xx < x1; xx++)
                        partition[yy * width + xx] = v;
            }
        }
    }
}
