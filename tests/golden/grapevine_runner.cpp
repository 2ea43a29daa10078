// Golden oracle for the grapevine photosynthesis / transpiration stack.
//
// Compiles the UNMODIFIED reference sources (src/grapevine/grapevine.cpp and
// its agrolib dependencies) and drives the private chain
//   weatherVariables -> radiationAbsorption -> aerodynamicalCoupling ->
//   upscale -> carbonWaterFluxesProfileNoStress -> carbonWaterFluxesProfile
// (photosynthesisAndTranspiration, grapevine.cpp:385-396) on inputs read
// from stdin, printing the outputs at full precision.  This TU is built
// with -fno-access-control so the test can pin members the reference never
// exposes a setter for (including myPlantHeight, which upstream reads
// UNINITIALIZED in aerodynamicalCoupling — DEVIATIONS #24).
//
// Input (whitespace-separated):
//   lai sunElev direct diffuse cloud tAir rh wind pressure meanMonthT
//   year doy plantHeight stage nLayers
//   stress[0..n-1] rootDensity[0..n-1]
//   alpha vpdSensitivity maxCarboxRate
// Output lines: key value [value...]
#include <cstdio>
#include <cstdlib>
#include "grapevine.h"

int main() {
    double lai, sunElev, direct, diffuse, cloud, tAir, rh, wind, pressure;
    double meanMonthT, plantHeight, stageIn;
    int year, doy, nLayers;
    if (scanf("%lf %lf %lf %lf %lf %lf %lf %lf %lf %lf %d %d %lf %lf %d",
              &lai, &sunElev, &direct, &diffuse, &cloud, &tAir, &rh, &wind,
              &pressure, &meanMonthT, &year, &doy, &plantHeight, &stageIn,
              &nLayers) != 15) { fprintf(stderr, "bad header\n"); return 2; }

    Vine3D_Grapevine gv;
    gv.initializeLayers(nLayers);

    double *stress = new double[nLayers];
    double *rootDen = new double[nLayers];
    for (int i = 0; i < nLayers; i++)
        if (scanf("%lf", &stress[i]) != 1) return 2;
    for (int i = 0; i < nLayers; i++)
        if (scanf("%lf", &rootDen[i]) != 1) return 2;

    TVineCultivar cv;
    if (scanf("%lf %lf %lf", &cv.parameterWangLeuning.alpha,
              &cv.parameterWangLeuning.sensitivityToVapourPressureDeficit,
              &cv.parameterWangLeuning.maxCarboxRate) != 3) return 2;
    cv.parameterWangLeuning.waterStressThreshold = 0.4;
    cv.parameterWangLeuning.psiLeaf = 1800.0;

    Crit3DModelCase mc;
    mc.cultivar = &cv;
    mc.soilLayersNr = nLayers;
    mc.rootDensity = rootDen;

    // members the reference sets in compute() (grapevine.cpp:26-38)
    gv.simulationStepInSeconds = 3600.0;
    gv.isAmphystomatic = true;
    gv.myLeafWidth = 0.2;
    gv.alphaLeuning = cv.parameterWangLeuning.alpha;
    gv.getFixSimulationParameters();
    gv.chlorophyllContent = 500.0;                 // CHLDEFAULT
    gv.statePlant.stateGrowth.leafAreaIndex = lai;
    gv.statePlant.stateGrowth.meanTemperatureLastMonth = meanMonthT;
    gv.statePlant.statePheno.stage = stageIn;      // feeds leafWidth()
    gv.myPlantHeight = plantHeight;                // upstream: uninitialized
    gv.myYear = year;
    gv.myDoy = doy;
    for (int i = 0; i < nLayers; i++)
        gv.stressCoefficientProfile[i] = stress[i];

    gv.setWeather(meanMonthT, tAir, direct + diffuse, 0.0, rh, wind,
                  pressure);
    gv.setDerivedVariables(diffuse, direct, cloud, sunElev);

    gv.weatherVariables();
    gv.radiationAbsorption();
    gv.aerodynamicalCoupling();
    gv.upscale(&cv);
    gv.carbonWaterFluxesProfileNoStress(&mc);
    gv.carbonWaterFluxesProfile(&mc);
    double stressCoeff = gv.getStressCoefficient();

    printf("assimilation %.17g\n", gv.assimilationInstant);
    printf("total_gs %.17g\n", gv.totalStomatalConductance);
    printf("transp_nostress %.17g\n", gv.transpirationInstantNoStress);
    printf("stress_coeff %.17g\n", stressCoeff);
    printf("transp_layer");
    for (int i = 0; i < nLayers; i++)
        printf(" %.17g", gv.transpirationInstantLayer[i]);
    printf("\n");
    // intermediates for debugging envelope breaks
    printf("vpd %.17g\n", gv.myVaporPressureDeficit);
    printf("par_sun %.17g\n", gv.sunlit.absorbedPAR);
    printf("par_shade %.17g\n", gv.shaded.absorbedPAR);
    printf("rni_sun %.17g\n", gv.sunlit.isothermalNetRadiation);
    printf("rni_shade %.17g\n", gv.shaded.isothermalNetRadiation);
    printf("lai_sun %.17g\n", gv.sunlit.leafAreaIndex);
    printf("vcmax_sun %.17g\n", gv.sunlit.maximalCarboxylationRate);
    printf("j_sun %.17g\n", gv.sunlit.maximalElectronTrasportRate);
    printf("rd_sun %.17g\n", gv.sunlit.darkRespiration);
    printf("gscmin_sun %.17g\n", gv.sunlit.minimalStomatalConductance);
    printf("gco2_sun %.17g\n", gv.sunlit.aerodynamicConductanceCO2Exchange);
    delete[] stress; delete[] rootDen;
    return 0;
}
