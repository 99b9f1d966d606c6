/* Test harness (ours, not reference code): reaches the reference's legacy fully-INT8
 * pipeline (network_predict_quantized_old), which is unreachable from its CLI, so the
 * rebuilt framework's int8_policy="cpu_old" mode can be validated against it.
 *
 * Usage: old_int8_harness <cfg> <weights> <input.f32> <n_out>
 *   input.f32: raw float32 array of net.w*net.h*net.c values (darknet CHW layout)
 *   prints the first n_out values of the final layer output, one per line.
 */
#include <stdio.h>
#include <stdlib.h>

#include "additionally.h"

extern float *network_predict_quantized_old(network net, float *input);

int main(int argc, char **argv) {
    if (argc < 5) {
        fprintf(stderr, "usage: %s cfg weights input.f32 n_out\n", argv[0]);
        return 1;
    }
    network net = parse_network_cfg(argv[1], 1, 1);
    load_weights_upto_cpu(&net, argv[2], net.n);
    yolov2_fuse_conv_batchnorm(net);
    quantinization_and_get_multipliers(net);

    int n_in = net.w * net.h * net.c;
    float *input = calloc(n_in, sizeof(float));
    FILE *f = fopen(argv[3], "rb");
    if (!f || fread(input, sizeof(float), n_in, f) != (size_t)n_in) {
        fprintf(stderr, "bad input file\n");
        return 1;
    }
    fclose(f);

    float *out = network_predict_quantized_old(net, input);
    int n_out = atoi(argv[4]);
    for (int i = 0; i < n_out; ++i) printf("OUT %.6f\n", out[i]);
    return 0;
}
