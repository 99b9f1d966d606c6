/* Minimal OpenCV C-API type stubs — just enough surface to compile the
 * reference demo (src/main.c:250-580) against a deterministic capture that
 * feeds raw frames from a file, so the demo's printed streams can be
 * oracle-diffed without a real OpenCV build (VERDICT r3 "missing #1").
 * Test scaffolding only; not shipped framework code. */
#ifndef CVSTUB_TYPES_C_H
#define CVSTUB_TYPES_C_H

#ifdef __cplusplus
extern "C" {
#endif

typedef void CvArr;

typedef struct IplImage {
    int nChannels;
    int depth;
    int width;
    int height;
    int widthStep;          /* bytes per row (= width*nChannels here) */
    char *imageData;
} IplImage;

typedef struct CvSize { int width, height; } CvSize;
typedef struct CvPoint { int x, y; } CvPoint;
typedef struct CvScalar { double val[4]; } CvScalar;
typedef struct CvFont {
    int font_face; double hscale, vscale, shear; int thickness, line_type;
} CvFont;

static CvSize cvSize(int w, int h) { CvSize s; s.width = w; s.height = h; return s; }
static CvPoint cvPoint(int x, int y) { CvPoint p; p.x = x; p.y = y; return p; }
static CvScalar cvScalar(double b, double g, double r, double a)
{ CvScalar s; s.val[0] = b; s.val[1] = g; s.val[2] = r; s.val[3] = a; return s; }
#define CV_RGB(r, g, b) cvScalar((b), (g), (r), 0)

#define IPL_DEPTH_8U 8
#define CV_FILLED (-1)
#define CV_WINDOW_NORMAL 0
#define CV_INTER_LINEAR 1
#define CV_FONT_HERSHEY_SIMPLEX 0
#define CV_FONT_HERSHEY_COMPLEX 3
#define CV_CAP_PROP_FPS 5
#define CV_FOURCC(c1, c2, c3, c4) \
    (((c1) & 255) + (((c2) & 255) << 8) + (((c3) & 255) << 16) + (((c4) & 255) << 24))

#ifdef __cplusplus
}
#endif
#endif
