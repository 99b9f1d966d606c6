/* Test harness (ours, not reference code): reaches the reference's map-file region
 * decode (get_region_boxes_cpu with a non-NULL map), which is unreachable from its
 * CLI (every call site passes map=0, src/main.c:228, src/additionally.c:4664), so
 * the rebuilt framework's class_map decode can be validated against it.
 *
 * The reference's map branch loops a hard-coded 200 entries
 * (src/yolov2_forward_network.c:694-698), so the cfg under test must have
 * classes >= 200 and the map file exactly 200 lines; prob rows are allocated
 * oversize here for safety.
 *
 * Usage: region_map_harness <cfg> <weights> <input.f32> <map_file> <thresh>
 *   input.f32: raw float32 array of net.w*net.h*net.c values (darknet CHW layout)
 *   prints "BOX i x y w h" per cell*anchor and "PROB i j p" for nonzero probs.
 */
#include <stdio.h>
#include <stdlib.h>

#include "additionally.h"

void get_region_boxes_cpu(layer l, int w, int h, float thresh, float **probs,
                          box *boxes, int only_objectness, int *map);

int main(int argc, char **argv) {
    if (argc < 6) {
        fprintf(stderr, "usage: %s cfg weights input.f32 map thresh\n", argv[0]);
        return 1;
    }
    network net = parse_network_cfg(argv[1], 1, 0);
    load_weights_upto_cpu(&net, argv[2], net.n);
    yolov2_fuse_conv_batchnorm(net);

    int n_in = net.w * net.h * net.c;
    float *input = calloc(n_in, sizeof(float));
    FILE *f = fopen(argv[3], "rb");
    if (!f || fread(input, sizeof(float), n_in, f) != (size_t)n_in) {
        fprintf(stderr, "bad input file\n");
        return 1;
    }
    fclose(f);

    int *map = read_map(argv[4]);
    float thresh = atof(argv[5]);

    network_predict_cpu(net, input);
    layer l = net.layers[net.n - 1];
    int total = l.w * l.h * l.n;
    box *boxes = calloc(total, sizeof(box));
    float **probs = calloc(total, sizeof(float *));
    for (int j = 0; j < total; ++j) probs[j] = calloc(512, sizeof(float));

    get_region_boxes_cpu(l, 1, 1, thresh, probs, boxes, 0, map);

    for (int i = 0; i < total; ++i)
        printf("BOX %d %.6f %.6f %.6f %.6f\n", i,
               boxes[i].x, boxes[i].y, boxes[i].w, boxes[i].h);
    for (int i = 0; i < total; ++i)
        for (int j = 0; j < 200; ++j)
            if (probs[i][j] != 0)
                printf("PROB %d %d %.6f\n", i, j, probs[i][j]);
    return 0;
}
