/* cvstub: core C-API declarations (implemented in tests/data/cvstub/cvstub.c). */
#ifndef CVSTUB_CORE_C_H
#define CVSTUB_CORE_C_H
#include "types_c.h"

#ifdef __cplusplus
extern "C" {
#endif

IplImage *cvCreateImage(CvSize size, int depth, int channels);
void cvReleaseImage(IplImage **image);

void cvRectangle(CvArr *img, CvPoint pt1, CvPoint pt2, CvScalar color,
                 int thickness, int line_type, int shift);
void cvLine(CvArr *img, CvPoint pt1, CvPoint pt2, CvScalar color,
            int thickness, int line_type, int shift);
void cvInitFont(CvFont *font, int font_face, double hscale, double vscale,
                double shear, int thickness, int line_type);
void cvPutText(CvArr *img, const char *text, CvPoint org, const CvFont *font,
               CvScalar color);

#ifdef __cplusplus
}
#endif
#endif
