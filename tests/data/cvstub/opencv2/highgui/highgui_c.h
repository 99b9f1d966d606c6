/* cvstub: highgui C-API — windows are no-ops; capture reads the raw CVSTUBV1
 * frame file (see cvstub.c for the format). */
#ifndef CVSTUB_HIGHGUI_C_H
#define CVSTUB_HIGHGUI_C_H
#include "../core/types_c.h"
#include "../core/core_c.h"
#include "../imgproc/imgproc_c.h"

#ifdef __cplusplus
extern "C" {
#endif

typedef struct CvCapture CvCapture;
typedef struct CvVideoWriter CvVideoWriter;

int cvNamedWindow(const char *name, int flags);
void cvShowImage(const char *name, const CvArr *image);
void cvMoveWindow(const char *name, int x, int y);
void cvResizeWindow(const char *name, int width, int height);
int cvWaitKey(int delay);
void cvDestroyAllWindows(void);

IplImage *cvLoadImage(const char *filename, int iscolor);

CvCapture *cvCaptureFromFile(const char *filename);
CvCapture *cvCaptureFromCAM(int index);
IplImage *cvQueryFrame(CvCapture *capture);
double cvGetCaptureProperty(CvCapture *capture, int property_id);

CvVideoWriter *cvCreateVideoWriter(const char *filename, int fourcc,
                                   double fps, CvSize frame_size,
                                   int is_color);
int cvWriteFrame(CvVideoWriter *writer, const IplImage *image);

#ifdef __cplusplus
}
#endif
#endif
