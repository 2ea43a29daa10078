// Golden oracle for the crop root-density atom scheme.
//
// Compiles the UNMODIFIED reference sources (agrolib/crop/root.cpp,
// crop.cpp, soil.cpp) and calls root::computeRootDensity3D — the per-cm
// "atom" discretisation + layer binning + skeleton correction
// (root.cpp:504-613) — on inputs from stdin.
//
// Input:
//   line 1: shape(0=cylindrical,1=cardioid) shapeDeformation rootDepthMin
//           currentRootLength soilTotalDepth coarseFragments nLayers
//   line 2: layerDepth[0..n-1]
//   line 3: layerThickness[0..n-1]
// Output: rootDensity[0..n-1] (normalised), firstRootLayer lastRootLayer
#include <cstdio>
#include <vector>
#include "crop.h"
#include "root.h"
#include "soil.h"

int main() {
    int shape, nLayers;
    double deform, depthMin, rootLen, totalDepth, coarse;
    if (scanf("%d %lf %lf %lf %lf %lf %d", &shape, &deform, &depthMin,
              &rootLen, &totalDepth, &coarse, &nLayers) != 7) return 2;

    std::vector<double> depth(nLayers), thick(nLayers);
    for (int i = 0; i < nLayers; i++)
        if (scanf("%lf", &depth[i]) != 1) return 2;
    for (int i = 0; i < nLayers; i++)
        if (scanf("%lf", &thick[i]) != 1) return 2;

    soil::Crit3DSoil mySoil;
    mySoil.totalDepth = totalDepth;
    // one horizon spanning the whole profile with the given skeleton
    soil::Crit3DHorizon hor;
    hor.upperDepth = 0.0;
    hor.lowerDepth = totalDepth;
    hor.coarseFragments = coarse;
    mySoil.horizon.push_back(hor);
    mySoil.nrHorizons = 1;

    Crit3DCrop crop;
    crop.roots.rootShape = shape == 1 ? CARDIOID_DISTRIBUTION
                                      : CYLINDRICAL_DISTRIBUTION;
    crop.roots.shapeDeformation = deform;
    crop.roots.rootDepthMin = depthMin;
    crop.roots.currentRootLength = rootLen;
    crop.roots.rootDepthMax = totalDepth;

    if (! root::computeRootDensity3D(crop, mySoil, unsigned(nLayers),
                                     depth, thick)) {
        fprintf(stderr, "computeRootDensity3D failed\n");
        return 3;
    }
    for (int i = 0; i < nLayers; i++)
        printf("%.17g ", crop.roots.rootDensity[i]);
    printf("\n%d %d\n", crop.roots.firstRootLayer, crop.roots.lastRootLayer);
    return 0;
}
