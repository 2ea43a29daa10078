// Golden-data generator for the INTERPOLATION library: drives the REFERENCE
// agrolib/interpolation (compiled unmodified, no Qt anywhere in the chain)
// over a station set + target list and prints the interpolated values.
// Oracle for tests/test_interpolation_parity.py (VERDICT round-1 item 7).
//
// Input format (text, stdin or file):
//   SETTINGS <algo:idw|shepard|shepard_modified> <useDetrending:0|1> <minR2>
//            <precThreshold>
//   VAR <airTemperature|precipitation|airRelHumidity|windScalarIntensity>
//   STATIONS <n>
//   <x> <y> <z> <value>          (NODATA = -9999)
//   TARGETS <m>
//   <x> <y> <z>
//
// Output: per target, one line "<value>" (%.10g); then a line
// "REGRESSION <r2> <slope> <intercept>" for the elevation proxy.

#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <string>
#include <algorithm>
#include <vector>

#include "interpolation.h"
#include "interpolationSettings.h"
#include "interpolationPoint.h"
#include "meteoPoint.h"

static void die(const char* msg) {
    std::fprintf(stderr, "interpolation_runner: %s\n", msg);
    std::exit(1);
}

int main(int argc, char** argv) {
    FILE* f = argc > 1 ? std::fopen(argv[1], "r") : stdin;
    if (!f) die("cannot open input");

    char tag[64], algo[32], varName[64];
    int useDetrending;
    float minR2, precThreshold;
    if (std::fscanf(f, "%63s %31s %d %f %f", tag, algo, &useDetrending,
                    &minR2, &precThreshold) != 5
        || std::strcmp(tag, "SETTINGS"))
        die("bad SETTINGS");
    if (std::fscanf(f, "%63s %63s", tag, varName) != 2
        || std::strcmp(tag, "VAR"))
        die("bad VAR");

    meteoVariable var = airTemperature;
    if (!std::strcmp(varName, "precipitation")) var = precipitation;
    else if (!std::strcmp(varName, "airRelHumidity")) var = airRelHumidity;
    else if (!std::strcmp(varName, "windScalarIntensity"))
        var = windScalarIntensity;
    else if (!std::strcmp(varName, "globalIrradiance"))
        var = globalIrradiance;

    unsigned n;
    if (std::fscanf(f, "%63s %u", tag, &n) != 2 || std::strcmp(tag, "STATIONS"))
        die("bad STATIONS");

    Crit3DInterpolationSettings settings;
    settings.initialize();
    TInterpolationMethod method = idw;
    if (!std::strcmp(algo, "shepard")) method = shepard;
    else if (!std::strcmp(algo, "shepard_modified"))
        method = shepard_modified;
    settings.setInterpolationMethod(method);
    settings.setUseThermalInversion(false);
    settings.setUseTD(false);
    settings.setUseMultipleDetrending(false);
    settings.setUseLapseRateCode(false);
    settings.setMinRegressionR2(minR2);

    Crit3DProxy heightProxy;
    heightProxy.setName("elevation");
    settings.addProxy(heightProxy, useDetrending != 0);

    Crit3DMeteoSettings meteoSettings;
    meteoSettings.setRainfallThreshold(precThreshold);
    Crit3DClimateParameters climateParams;

    std::vector<Crit3DInterpolationDataPoint> points;
    for (unsigned i = 0; i < n; ++i) {
        double x, y, z, v;
        if (std::fscanf(f, "%lf %lf %lf %lf", &x, &y, &z, &v) != 4)
            die("bad station");
        if (v == NODATA) continue;   // the app filters NODATA before
        Crit3DInterpolationDataPoint pt;
        pt.point = new gis::Crit3DPoint(x, y, z);
        pt.index = (int)i;
        pt.isActive = true;
        pt.value = (float)v;
        pt.lapseRateCode = primary;
        pt.regressionWeight = 1.f;
        pt.proxyValues.push_back((float)z);
        points.push_back(pt);
    }

    unsigned m;
    if (std::fscanf(f, "%63s %u", tag, &m) != 2 || std::strcmp(tag, "TARGETS"))
        die("bad TARGETS");
    std::vector<double> tx(m), ty(m), tz(m);
    for (unsigned j = 0; j < m; ++j)
        if (std::fscanf(f, "%lf %lf %lf", &tx[j], &ty[j], &tz[j]) != 3)
            die("bad target");
    if (f != stdin) std::fclose(f);

    // station bounding-box area: checkAndPassDataToInterpolation sets it
    // before interpolating (spatialControl.cpp:568); Shepard's initial
    // radius depends on it
    {
        double xMin = 1e30, xMax = -1e30, yMin = 1e30, yMax = -1e30;
        for (auto& pt : points) {
            xMin = std::min(xMin, pt.point->utm.x);
            xMax = std::max(xMax, pt.point->utm.x);
            yMin = std::min(yMin, pt.point->utm.y);
            yMax = std::max(yMax, pt.point->utm.y);
        }
        settings.setPointsBoundingBoxArea(float((xMax - xMin) * (yMax - yMin)));
    }

    std::vector<Crit3DMeteoPoint> meteoPoints;  // unused by this path
    std::string errorStr;
    if (!preInterpolation(points, settings, &meteoSettings, &climateParams,
                          meteoPoints, var, Crit3DTime(), errorStr))
        die(errorStr.c_str());

    for (unsigned j = 0; j < m; ++j) {
        std::vector<double> proxyValues;
        proxyValues.push_back(tz[j]);
        float v = interpolate(points, settings, &meteoSettings, var,
                              (float)tx[j], (float)ty[j], (float)tz[j],
                              proxyValues, false);
        std::printf("%.10g\n", v);
    }
    if (settings.getProxyNr() > 0) {
        Crit3DProxy* p = settings.getProxy(0);
        std::printf("REGRESSION %.10g %.10g %.10g\n",
                    p->getRegressionR2(), p->getRegressionSlope(),
                    p->getRegressionIntercept());
    }
    return 0;
}
