/* Golden-fixture generator.
 *
 * Compiles against the READ-ONLY reference sources (passed via -I / extra
 * translation unit on the gcc command line, see generate.py) and dumps every
 * intermediate buffer of a reference SGM run as raw binary files.  These
 * goldens pin the bit-exact contract for the TPU implementation; no
 * reference code is copied into this repository.
 *
 * Run ordering is chosen so no dump can be corrupted by the reference's
 * out-of-bounds behaviour:
 *
 *  Run A: LR check ON, speckle OFF  -> census/cost_init/cost_aggr/
 *         disp_right/disp_left_lr_median.  RemoveSpeckles never runs, so
 *         its big-frame wild writes (see below) cannot touch any buffer.
 *  Run B: WTA + median only         -> disp_left_wta_median.
 *  Run C (only when npx <= the reference's static 450*375 capacity):
 *         full pipeline             -> disp_left_full.  For larger frames
 *         RemoveSpeckles is undefined behaviour: its stack-local
 *         visited[MAX_IMG_SIZE]/vec[MAX_IMG_SIZE] arrays
 *         (SemiGlobalMatching.c:588-590) overflow, the corrupted pixel
 *         list drives wild `disparity_map[pixel] = INVALID_FLOAT` writes
 *         (observed landing inside cost_init dumps as 0x7F800000), so no
 *         full-pipeline golden exists for Cloth3/Wood2-size frames.
 *
 * Outputs (all little-endian, reference layouts):
 *   census_left.bin / census_right.bin : H*W uint32
 *   cost_init.bin                      : H*W*D uint8   (H, W, D)
 *   cost_aggr.bin                      : H*W*D uint16  (H, W, D)
 *   disp_right.bin                     : H*W float32 (raw inverse WTA)
 *   disp_left_lr_median.bin            : H*W float32 (LR+median, no speckle)
 *   disp_left_wta_median.bin           : H*W float32 (no LR/speckle run)
 *   disp_left_full.bin                 : H*W float32 (run C only)
 *   meta.txt                           : width height disp_range has_full
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <stdint.h>

#include "SemiGlobalMatching.h"

#define STBI_NO_LINEAR
#define STBI_NO_HDR
#define STB_IMAGE_IMPLEMENTATION
#include "stb_image.h"

void clear_cost_aggr_full(size_t bytes);  /* guard.c (generate.py) */

static void dump(const char* dir, const char* name, const void* data, size_t bytes)
{
    char path[1024];
    snprintf(path, sizeof(path), "%s/%s", dir, name);
    FILE* f = fopen(path, "wb");
    if (!f) { fprintf(stderr, "cannot open %s\n", path); exit(1); }
    fwrite(data, 1, bytes, f);
    fclose(f);
}

int main(int argc, char** argv)
{
    if (argc != 4) {
        fprintf(stderr, "usage: %s left.png right.png outdir\n", argv[0]);
        return 1;
    }
    const char* outdir = argv[3];

    int w, h, c, w2, h2, c2;
    unsigned char* img_left = stbi_load(argv[1], &w, &h, &c, 1);
    unsigned char* img_right = stbi_load(argv[2], &w2, &h2, &c2, 1);
    if (!img_left || !img_right || w != w2 || h != h2) {
        fprintf(stderr, "failed to load images\n");
        return 1;
    }

    SGMOption opt;
    memset(&opt, 0, sizeof(opt));
    opt.num_paths = 8;
    opt.min_disparity = 0;
    opt.max_disparity = 64;
    opt.is_check_lr = true;
    opt.lrcheck_thres = 1.0f;
    opt.is_check_unique = true;
    opt.uniqueness_ratio = 0.99f;
    opt.is_remove_speckles = false;   /* run A: see file header */
    opt.min_speckle_area = 50;
    opt.p1 = 10;
    opt.p2_init = 150;

    const uint16_t W = (uint16_t)w, H = (uint16_t)h;
    const size_t npx = (size_t)W * H;
    const size_t D = (size_t)(opt.max_disparity - opt.min_disparity);
    const int has_full = npx <= (size_t)450 * 375;  /* reference capacity */

    float* disp = (float*)malloc(npx * sizeof(float));
    if (!disp) { fprintf(stderr, "oom\n"); return 1; }

    /* Run A: LR on, speckle off */
    if (!SGM_Initialize(W, H, &opt)) { fprintf(stderr, "init failed\n"); return 1; }
    if (!SGM_Match(img_left, img_right, disp)) { fprintf(stderr, "match failed\n"); return 1; }

    dump(outdir, "census_left.bin", census_left_buffer, npx * sizeof(uint32_t));
    dump(outdir, "census_right.bin", census_right_buffer, npx * sizeof(uint32_t));
    dump(outdir, "cost_init.bin", cost_init_buffer, npx * D * sizeof(uint8_t));
    dump(outdir, "cost_aggr.bin", cost_aggr_buffer, npx * D * sizeof(uint16_t));
    dump(outdir, "disp_right.bin", disp_right_buffer, npx * sizeof(float));
    dump(outdir, "disp_left_lr_median.bin", disp, npx * sizeof(float));

    /* Run B: WTA + median only (LR check and speckle removal disabled).
     * SGM_Reset only memsets MAX_DISP_IMG_SIZE entries of cost_aggr
     * (SemiGlobalMatching.c:57); for pairs larger than the reference's
     * static cap (enlarged via the -fcommon guard buffers) the tail would
     * keep the previous run's sums, so clear the full used extent
     * ourselves via the guard helper (defined next to the enlarged
     * buffers, so the memset is in-bounds there). */
    clear_cost_aggr_full(npx * D * sizeof(uint16_t));
    opt.is_check_lr = false;
    if (!SGM_Reset(W, H, &opt)) { fprintf(stderr, "reset failed\n"); return 1; }
    if (!SGM_Match(img_left, img_right, disp)) { fprintf(stderr, "match B failed\n"); return 1; }
    dump(outdir, "disp_left_wta_median.bin", disp, npx * sizeof(float));

    /* Run C: full pipeline, only within the reference's own capacity */
    if (has_full) {
        clear_cost_aggr_full(npx * D * sizeof(uint16_t));
        opt.is_check_lr = true;
        opt.is_remove_speckles = true;
        if (!SGM_Reset(W, H, &opt)) { fprintf(stderr, "reset failed\n"); return 1; }
        if (!SGM_Match(img_left, img_right, disp)) { fprintf(stderr, "match C failed\n"); return 1; }
        dump(outdir, "disp_left_full.bin", disp, npx * sizeof(float));
    }

    char meta[128];
    snprintf(meta, sizeof(meta), "%d %d %d %d\n", (int)W, (int)H, (int)D, has_full);
    dump(outdir, "meta.txt", meta, strlen(meta));

    stbi_image_free(img_left);
    stbi_image_free(img_right);
    free(disp);
    printf("goldens written to %s (W=%d H=%d D=%d full=%d)\n", outdir, (int)W, (int)H, (int)D, has_full);
    return 0;
}
