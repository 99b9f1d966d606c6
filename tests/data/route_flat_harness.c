/* Test harness (ours, not reference code): exercises the reference's degenerate
 * route flat-concat — a [route] whose sources have mismatched spatial dims
 * memcpy-concats the raw CHW buffers (make_route_layer zeroes out dims,
 * src/additionally.c:2461-2466; forward_route_layer_cpu,
 * src/yolov2_forward_network.c:318-334). Unreachable from the CLI with a
 * printable result (no head can follow zeroed dims), so we print the final
 * layer output directly.
 *
 * Usage: route_flat_harness <cfg> <weights> <input.f32> <n_out>
 *   input.f32: raw float32 array of net.w*net.h*net.c values (darknet CHW)
 *   prints the first n_out values of the final layer output, one per line.
 */
#include <stdio.h>
#include <stdlib.h>

#include "additionally.h"

int main(int argc, char **argv) {
    if (argc < 5) {
        fprintf(stderr, "usage: %s cfg weights input.f32 n_out\n", argv[0]);
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

    float *out = network_predict_cpu(net, input);
    int n_out = atoi(argv[4]);
    for (int i = 0; i < n_out; ++i) printf("OUT %.6f\n", out[i]);
    return 0;
}
