/* cvstub: nothing from fast_math is used by the reference sources. */
#ifndef CVSTUB_FAST_MATH_HPP
#define CVSTUB_FAST_MATH_HPP
#endif
