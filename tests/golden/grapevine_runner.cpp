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
#include <string>
#include "grapevine.h"

// Phenology mode (first token "PHENO"): drives computePhenology daily with
// the driver-side thermal-sum bookkeeping of bin/VINE3D/plant.cpp:378-420.
//   PHENO co1 critChill forceFl forceFS forceVer forceMat ddVeraison
//         chilling forceBB forceVeg stage ddMarch ddFS daysAfterBloom
//         potentialBrix nDays
//   then nDays lines: doy tavg afterMarch(0/1)
// Output per day: stage chilling forceBB forceVeg ddMarch ddFS dab brix
static int run_pheno() {
    TVineCultivar cv;
    double chilling, fbb, fveg, stage, ddm, ddfs, dab, potBrix;
    int nDays;
    if (scanf("%lf %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf %d",
              &cv.parameterPhenoVitis.co1,
              &cv.parameterPhenoVitis.criticalChilling,
              &cv.parameterPhenoVitis.criticalForceStateFlowering,
              &cv.parameterPhenoVitis.criticalForceStateFruitSet,
              &cv.parameterPhenoVitis.criticalForceStateVeraison,
              &cv.parameterPhenoVitis.criticalForceStatePhysiologicalMaturity,
              &cv.parameterPhenoVitis.degreeDaysAtVeraison,
              &chilling, &fbb, &fveg, &stage, &ddm, &ddfs, &dab,
              &potBrix, &nDays) != 16) return 2;

    Vine3D_Grapevine gv;
    gv.initializeLayers(2);
    gv.getFixSimulationParameters();
    gv.statePlant.statePheno.chillingState = chilling;
    gv.statePlant.statePheno.forceStateBudBurst = fbb;
    gv.statePlant.statePheno.forceStateVegetativeSeason = fveg;
    gv.statePlant.statePheno.stage = stage;
    gv.statePlant.statePheno.degreeDaysFromFirstMarch = ddm;
    gv.statePlant.statePheno.degreeDaysAtFruitSet = ddfs;
    gv.statePlant.statePheno.daysAfterBloom = dab;
    gv.statePlant.stateGrowth.isHarvested = 0;
    gv.potentialBrix = potBrix;

    for (int d = 0; d < nDays; d++) {
        int doy, afterMarch;
        double tavg;
        if (scanf("%d %lf %d", &doy, &tavg, &afterMarch) != 3) return 2;
        // updateThermalSum (plant.cpp:378-420), scalar form
        bool isFruitSet = gv.statePlant.statePheno.stage >= fruitSet;
        if (isFruitSet &&
            gv.statePlant.statePheno.degreeDaysAtFruitSet == NODATA)
            gv.statePlant.statePheno.degreeDaysAtFruitSet =
                gv.statePlant.statePheno.degreeDaysFromFirstMarch;
        if (afterMarch) {
            if (gv.statePlant.statePheno.degreeDaysFromFirstMarch == NODATA)
                gv.statePlant.statePheno.degreeDaysFromFirstMarch =
                    tavg > 0 ? tavg : 0.0;
            else
                gv.statePlant.statePheno.degreeDaysFromFirstMarch +=
                    tavg > 0 ? tavg : 0.0;
        } else {
            gv.statePlant.statePheno.degreeDaysFromFirstMarch = NODATA;
        }
        gv.myDoy = doy;
        gv.myMeanDailyTemperature = tavg;
        bool isVeg = false;
        gv.computePhenology(true, &isVeg, &cv);
        // daysAfterBloom++ happens at the end of compute()
        // (grapevine.cpp:94-99)
        if (gv.statePlant.statePheno.stage >= flowering)
            gv.statePlant.statePheno.daysAfterBloom++;
        printf("%.17g %.17g %.17g %.17g %.17g %.17g %.17g %.17g\n",
               gv.statePlant.statePheno.stage,
               gv.statePlant.statePheno.chillingState,
               gv.statePlant.statePheno.forceStateBudBurst,
               gv.statePlant.statePheno.forceStateVegetativeSeason,
               gv.statePlant.statePheno.degreeDaysFromFirstMarch,
               gv.statePlant.statePheno.degreeDaysAtFruitSet,
               gv.statePlant.statePheno.daysAfterBloom,
               gv.statePlant.outputPlant.brixBerry);
    }
    return 0;
}

int main() {
    char mode[32];
    if (scanf("%31s", mode) != 1) return 2;
    if (std::string(mode) == "PHENO") return run_pheno();
    // not PHENO: the token was the photosynthesis-mode `lai` value
    // (stdin is a pipe — not seekable — so parse it directly)
    double lai, sunElev, direct, diffuse, cloud, tAir, rh, wind, pressure;
    double meanMonthT, plantHeight, stageIn;
    int year, doy, nLayers;
    lai = atof(mode);
    if (scanf("%lf %lf %lf %lf %lf %lf %lf %lf %lf %d %d %lf %lf %d",
              &sunElev, &direct, &diffuse, &cloud, &tAir, &rh, &wind,
              &pressure, &meanMonthT, &year, &doy, &plantHeight, &stageIn,
              &nLayers) != 14) { fprintf(stderr, "bad header\n"); return 2; }

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
