/* Test harness (ours, not reference code): reaches the reference's dead NMS
 * variants do_nms_sort_v2 (src/box.c:249) and do_nms (src/box.c:330), which no
 * reference CLI path calls, so the rebuilt framework's equivalents can be
 * validated against them.
 *
 * Usage: nms_variants_harness <mode> <data.f32> <total> <classes> <thresh>
 *   mode: "v2" or "plain"
 *   data.f32: total*4 floats (boxes x,y,w,h) followed by total*classes floats
 *   prints the post-NMS probs matrix, one row per line.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "box.h"

void do_nms_sort_v2(box *boxes, float **probs, int total, int classes, float thresh);
void do_nms(box *boxes, float **probs, int total, int classes, float thresh);

int main(int argc, char **argv) {
    if (argc < 6) {
        fprintf(stderr, "usage: %s mode data.f32 total classes thresh\n", argv[0]);
        return 1;
    }
    const char *mode = argv[1];
    int total = atoi(argv[3]);
    int classes = atoi(argv[4]);
    float thresh = atof(argv[5]);

    box *boxes = calloc(total, sizeof(box));
    float **probs = calloc(total, sizeof(float *));
    FILE *f = fopen(argv[2], "rb");
    if (!f) { fprintf(stderr, "bad data file\n"); return 1; }
    for (int i = 0; i < total; ++i) {
        float b[4];
        if (fread(b, sizeof(float), 4, f) != 4) return 1;
        boxes[i].x = b[0]; boxes[i].y = b[1]; boxes[i].w = b[2]; boxes[i].h = b[3];
    }
    for (int i = 0; i < total; ++i) {
        probs[i] = calloc(classes, sizeof(float));
        if (fread(probs[i], sizeof(float), classes, f) != (size_t)classes) return 1;
    }
    fclose(f);

    if (strcmp(mode, "v2") == 0)
        do_nms_sort_v2(boxes, probs, total, classes, thresh);
    else
        do_nms(boxes, probs, total, classes, thresh);

    for (int i = 0; i < total; ++i) {
        for (int k = 0; k < classes; ++k) printf("%.6f ", probs[i][k]);
        printf("\n");
    }
    return 0;
}
