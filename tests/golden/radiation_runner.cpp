// Golden-oracle runner for the reference solar-radiation library.
//
// Compiles the UNMODIFIED agrolib/solarRadiation (+gis, meteo,
// mathFunctions, crit3dDate — no Qt anywhere in the chain) and drives
// radiation::computeRadiationDEM over a DEM provided on stdin, printing
// per-cell lat/lon/slope/aspect (as the reference derives them) and the
// computed sun elevation + beam/diffuse/reflected/global irradiance.
//
// stdin:
//   R C cellsize xll yll nodata utmZone timeZone isUTC
//   year month day hour minute
//   linke albedo clearSky transmissivity realSky shadowing
//   R*C dem values (row-major, row 0 = northernmost)
// stdout:
//   one line per cell: row col lat lon slope aspect elev global beam
//   diffuse reflected  (NODATA cells skipped)

#include <cstdio>

#include "commonConstants.h"
#include "basicMath.h"
#include "crit3dDate.h"
#include "gis.h"
#include "radiationSettings.h"
#include "solarRadiation.h"

int main() {
    int R, C, utmZone, timeZone, isUTC;
    double cellsize, xll, yll, nodata;
    if (std::scanf("%d %d %lf %lf %lf %lf %d %d %d", &R, &C, &cellsize,
                   &xll, &yll, &nodata, &utmZone, &timeZone, &isUTC) != 9)
        return 1;
    int year, month, day, hour, minute;
    if (std::scanf("%d %d %d %d %d", &year, &month, &day, &hour, &minute)
        != 5)
        return 1;
    double linke, albedo, clearSky, transmissivity;
    int realSky, shadowing;
    if (std::scanf("%lf %lf %lf %lf %d %d", &linke, &albedo, &clearSky,
                   &transmissivity, &realSky, &shadowing) != 6)
        return 1;

    gis::Crit3DRasterHeader header;
    header.nrRows = R;
    header.nrCols = C;
    header.cellSize = cellsize;
    header.llCorner.x = xll;
    header.llCorner.y = yll;
    header.flag = float(nodata);
    header.invCellSize = 1.0 / cellsize;   // getRowCol depends on it

    gis::Crit3DRasterGrid dem;
    dem.initializeGrid(header);
    for (int r = 0; r < R; ++r)
        for (int c = 0; c < C; ++c) {
            double v;
            if (std::scanf("%lf", &v) != 1) return 1;
            dem.value[r][c] = float(v);
        }
    dem.isLoaded = true;
    gis::updateMinMaxRasterGrid(&dem);

    gis::Crit3DGisSettings gisSettings;
    gisSettings.utmZone = utmZone;
    gisSettings.isUTC = isUTC != 0;
    gisSettings.timeZone = timeZone;

    Crit3DRadiationSettings settings;
    settings.setGisSettings(&gisSettings);
    settings.setAlgorithm(RADIATION_ALGORITHM_RSUN);
    settings.setRealSky(realSky != 0);
    settings.setShadowing(shadowing != 0);
    settings.setLinkeDefault(float(linke));
    settings.setAlbedo(float(albedo));
    settings.setClearSky(float(clearSky));

    Crit3DRadiationMaps maps(dem, gisSettings);
    for (int r = 0; r < R; ++r)
        for (int c = 0; c < C; ++c)
            if (! isEqual(dem.value[r][c], header.flag))
                maps.transmissivityMap->value[r][c] = float(transmissivity);

    Crit3DTime t(Crit3DDate(day, month, year), hour * 3600 + minute * 60);
    if (! radiation::computeRadiationDEM(&settings, dem, &maps, t, false)) {
        std::fprintf(stderr, "computeRadiationDEM failed\n");
        return 2;
    }

    for (int r = 0; r < R; ++r)
        for (int c = 0; c < C; ++c) {
            if (isEqual(dem.value[r][c], header.flag)) continue;
            std::printf("%d %d %.8f %.8f %.5f %.5f %.5f %.5f %.5f %.5f %.5f\n",
                        r, c,
                        maps.latMap->value[r][c], maps.lonMap->value[r][c],
                        maps.slopeMap->value[r][c],
                        maps.aspectMap->value[r][c],
                        maps.sunElevationMap->value[r][c],
                        maps.globalRadiationMap->value[r][c],
                        maps.beamRadiationMap->value[r][c],
                        maps.diffuseRadiationMap->value[r][c],
                        maps.reflectedRadiationMap->value[r][c]);
        }
    return 0;
}
