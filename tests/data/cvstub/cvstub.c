/* cvstub implementation: a deterministic stand-in for the OpenCV C API used
 * by the reference demo (src/main.c:250-580, src/additionally.c OPENCV
 * sections, draw_distribution). Windows/drawing are no-ops (the demo's
 * PRINTED streams are what the parity tests diff); the capture feeds raw
 * BGR24 frames from a CVSTUBV1 file:
 *
 *   bytes 0-7   magic "CVSTUBV1"
 *   int32 x 4   width, height, n_frames, fps   (little-endian)
 *   then n_frames x (height*width*3) bytes of BGR24, row-major
 *
 * cvResize only supports same-size copies (the tests feed frames already at
 * net dims, making the reference's two cvResize calls identity) — a real
 * OpenCV INTER_LINEAR would otherwise have to be reproduced bit-exactly.
 * Test scaffolding only; not shipped framework code. */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <unistd.h>

#include "opencv2/core/types_c.h"
#include "opencv2/core/core_c.h"
#include "opencv2/imgproc/imgproc_c.h"
#include "opencv2/highgui/highgui_c.h"

IplImage *cvCreateImage(CvSize size, int depth, int channels)
{
    IplImage *img = (IplImage *)calloc(1, sizeof(IplImage));
    img->nChannels = channels;
    img->depth = depth;
    img->width = size.width;
    img->height = size.height;
    img->widthStep = size.width * channels;
    img->imageData = (char *)calloc((size_t)img->widthStep * size.height, 1);
    return img;
}

void cvReleaseImage(IplImage **image)
{
    if (image && *image) {
        free((*image)->imageData);
        free(*image);
        *image = NULL;
    }
}

void cvResize(const CvArr *src_, CvArr *dst_, int interpolation)
{
    const IplImage *src = (const IplImage *)src_;
    IplImage *dst = (IplImage *)dst_;
    (void)interpolation;
    if (src->width != dst->width || src->height != dst->height
            || src->nChannels != dst->nChannels) {
        fprintf(stderr, "cvstub: cvResize only supports same-size copies "
                "(%dx%d -> %dx%d); feed frames at net dims\n",
                src->width, src->height, dst->width, dst->height);
        exit(2);
    }
    for (int y = 0; y < src->height; ++y)
        memcpy(dst->imageData + (size_t)y * dst->widthStep,
               src->imageData + (size_t)y * src->widthStep,
               (size_t)src->width * src->nChannels);
}

/* drawing + windows: no-ops (stream parity only) */
void cvRectangle(CvArr *img, CvPoint pt1, CvPoint pt2, CvScalar color,
                 int thickness, int line_type, int shift)
{ (void)img; (void)pt1; (void)pt2; (void)color; (void)thickness;
  (void)line_type; (void)shift; }
void cvLine(CvArr *img, CvPoint pt1, CvPoint pt2, CvScalar color,
            int thickness, int line_type, int shift)
{ (void)img; (void)pt1; (void)pt2; (void)color; (void)thickness;
  (void)line_type; (void)shift; }
void cvInitFont(CvFont *font, int font_face, double hscale, double vscale,
                double shear, int thickness, int line_type)
{ (void)font; (void)font_face; (void)hscale; (void)vscale; (void)shear;
  (void)thickness; (void)line_type; }
void cvPutText(CvArr *img, const char *text, CvPoint org, const CvFont *font,
               CvScalar color)
{ (void)img; (void)text; (void)org; (void)font; (void)color; }
int cvNamedWindow(const char *name, int flags)
{ (void)name; (void)flags; return 0; }
void cvShowImage(const char *name, const CvArr *image)
{ (void)name; (void)image; }
void cvMoveWindow(const char *name, int x, int y)
{ (void)name; (void)x; (void)y; }
void cvResizeWindow(const char *name, int width, int height)
{ (void)name; (void)width; (void)height; }
int cvWaitKey(int delay) { (void)delay; return -1; }
void cvDestroyAllWindows(void) {}

IplImage *cvLoadImage(const char *filename, int iscolor)
{ (void)filename; (void)iscolor; return NULL; }

struct CvCapture {
    FILE *f;
    int w, h, n, fps, pos;
    IplImage *frame;
};

CvCapture *cvCaptureFromFile(const char *filename)
{
    FILE *f = fopen(filename, "rb");
    if (!f) return NULL;
    char magic[8];
    if (fread(magic, 1, 8, f) != 8 || memcmp(magic, "CVSTUBV1", 8) != 0) {
        fclose(f);
        return NULL;
    }
    int hdr[4];
    if (fread(hdr, 4, 4, f) != 4) { fclose(f); return NULL; }
    CvCapture *cap = (CvCapture *)calloc(1, sizeof(CvCapture));
    cap->f = f;
    cap->w = hdr[0]; cap->h = hdr[1]; cap->n = hdr[2]; cap->fps = hdr[3];
    cap->frame = cvCreateImage(cvSize(cap->w, cap->h), IPL_DEPTH_8U, 3);
    return cap;
}

CvCapture *cvCaptureFromCAM(int index) { (void)index; return NULL; }

IplImage *cvQueryFrame(CvCapture *cap)
{
    if (!cap || cap->pos >= cap->n) {
        /* Determinism aid: the demo's fetch thread error()-exits the process
         * on stream end (src/main.c:377-379) while the LAST frame's detect
         * thread is still printing; a grace sleep lets the tiny-net detect
         * finish so the parity stream always contains all n frames. */
        usleep(500 * 1000);
        return NULL;
    }
    size_t bytes = (size_t)cap->w * cap->h * 3;
    if (fread(cap->frame->imageData, 1, bytes, cap->f) != bytes) return NULL;
    cap->pos++;
    return cap->frame;  /* capture-owned, like real OpenCV */
}

double cvGetCaptureProperty(CvCapture *cap, int property_id)
{
    if (cap && property_id == CV_CAP_PROP_FPS) return (double)cap->fps;
    return 0.0;
}

CvVideoWriter *cvCreateVideoWriter(const char *filename, int fourcc,
                                   double fps, CvSize frame_size, int is_color)
{ (void)filename; (void)fourcc; (void)fps; (void)frame_size; (void)is_color;
  return NULL; }
int cvWriteFrame(CvVideoWriter *writer, const IplImage *image)
{ (void)writer; (void)image; return 0; }
