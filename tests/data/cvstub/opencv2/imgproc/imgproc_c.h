/* cvstub: imgproc C-API declarations. */
#ifndef CVSTUB_IMGPROC_C_H
#define CVSTUB_IMGPROC_C_H
#include "../core/types_c.h"

#ifdef __cplusplus
extern "C" {
#endif

void cvResize(const CvArr *src, CvArr *dst, int interpolation);

#ifdef __cplusplus
}
#endif
#endif
