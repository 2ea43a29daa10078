// Golden oracle for the RothC soil-carbon model.
//
// Compiles the UNMODIFIED reference sources (src/rothCplusplus) and steps
// Crit3DRothCplusplus::computeRothCPoint over a monthly forcing sequence,
// printing the carbon pools each month at full precision.
//
// Input:
//   line 1: clay depth swc dpm rpm bio hum iom nMonths
//   then nMonths lines: temperature bic inputC plantCover
// Output per month: DPM RPM BIO HUM IOM SOC SWC
#include <cstdio>
#include "rothCplusplus.h"

int main() {
    double clay, depth, swc, dpm, rpm, bio, hum, iom;
    int n;
    if (scanf("%lf %lf %lf %lf %lf %lf %lf %lf %d",
              &clay, &depth, &swc, &dpm, &rpm, &bio, &hum, &iom, &n) != 9)
        return 2;

    Crit3DRothCplusplus rc;
    rc.initialize();
    rc.isInitializing = false;
    rc.radioCarbon.isActive = false;
    rc.setClay(clay);
    rc.setDepth(depth);
    rc.setSWC(swc);
    rc.setDPM(dpm); rc.setRPM(rpm); rc.setBIO(bio);
    rc.setHUM(hum); rc.setIOM(iom);

    for (int i = 0; i < n; i++) {
        double t, bic, cin, pc;
        if (scanf("%lf %lf %lf %lf", &t, &bic, &cin, &pc) != 4) return 2;
        rc.meteoVariable.setTemperature(t);
        rc.meteoVariable.setBIC(bic);
        rc.setInputC(cin);
        rc.setPlantCover(pc);
        rc.computeRothCPoint();
        printf("%.17g %.17g %.17g %.17g %.17g %.17g %.17g\n",
               rc.getDPM(), rc.getRPM(), rc.getBIO(), rc.getHUM(),
               rc.getIOM(), rc.getSOC(), rc.getSWC());
        rc.resetInputVariables();
    }
    return 0;
}
