/* cvstub: pretend to be OpenCV 2.4 so the reference takes its 2.4 include
 * branch (no imgcodecs/videoio headers, src/main.c:13-22,
 * src/additionally.h:38-42). */
#ifndef CVSTUB_VERSION_HPP
#define CVSTUB_VERSION_HPP
#define CV_VERSION_EPOCH 2
#define CV_VERSION_MAJOR 4
#define CV_VERSION_MINOR 13
#define CV_VERSION_REVISION 0
#define CVAUX_STR_EXP(x) #x
#define CVAUX_STR(x) CVAUX_STR_EXP(x)
#endif
