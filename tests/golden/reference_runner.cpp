// Golden-data generator: drives the REFERENCE soilFluxes3D solver
// (compiled unmodified from /root/reference) over a topology file produced
// by criteria3d_tpu's grid builder, and dumps per-node total potential after
// each simulated hour. The dumps are the cross-implementation oracle for
// tests/test_reference_parity.py (SURVEY.md §4: allclose against reference
// state dumps).
//
// Topology file format (text, '#' comments):
//   NODES <n> <nrSurface> <nrLateralLinks>
//   <index> <x> <y> <z> <volume> <isSurface> <btype> <slope> <barea>
//        <soilIdx> <horIdx> <surfIdx> <pond> <psi0> <sink>
//   LINKS <m>
//   <node> <linked> <type:0=up,1=down,2=lateral> <area>
//   SOILS <k>
//   <soilIdx> <horIdx> <alpha> <n> <m> <he> <thetaR> <thetaS> <ksat> <L>
//   SURFACES <k>
//   <surfIdx> <roughness>
//   PARAMS <dtMin> <dtMax> <maxIter> <maxApprox> <tolExp> <mbrExp> <lvRatio>
//   HOURS <h>
//
// Output: one line per hour: "HOUR <i> <MBR>" then n lines "<index> <H>".

#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <algorithm>
#include <vector>

#include "soilFluxes3D.h"
#include "cpusolver.h"

namespace soilFluxes3D { inline namespace v2 {
    extern nodesData_t nodeGrid;   // internal state, read for DT diagnostics
    extern Solver* solver;         // for matrix-row diagnostics (debugDt)
}}

using namespace soilFluxes3D::v2;

static void die(const char* msg) {
    std::fprintf(stderr, "reference_runner: %s\n", msg);
    std::exit(1);
}

static void check(SF3Derror_t err, const char* what) {
    if (err != SF3Derror_t::SF3Dok) {
        std::fprintf(stderr, "reference_runner: %s failed (%d)\n", what,
                     (int)castToUnderlyingType(err));
        std::exit(1);
    }
}

int main(int argc, char** argv) {
    if (argc < 3)
        die("usage: reference_runner topology.txt output.txt [nthreads]");
    int nThreads = argc > 3 ? std::atoi(argv[3]) : 2;
    FILE* f = std::fopen(argv[1], "r");
    if (!f) die("cannot open topology file");
    FILE* out = std::fopen(argv[2], "w");
    if (!out) die("cannot open output file");

    char tag[64];
    unsigned n, nSurf, nLat;
    if (std::fscanf(f, "%63s %u %u %u", tag, &n, &nSurf, &nLat) != 4
        || std::strcmp(tag, "NODES") != 0)
        die("bad NODES header");

    struct NodeRec {
        unsigned idx; double x, y, z, vol; int isSurf, btype;
        double slope, barea; int soilIdx, horIdx, surfIdx;
        double pond, psi0, sink;
    };
    std::vector<NodeRec> nodes(n);
    for (unsigned i = 0; i < n; ++i) {
        NodeRec& r = nodes[i];
        if (std::fscanf(f, "%u %lf %lf %lf %lf %d %d %lf %lf %d %d %d %lf %lf %lf",
                        &r.idx, &r.x, &r.y, &r.z, &r.vol, &r.isSurf, &r.btype,
                        &r.slope, &r.barea, &r.soilIdx, &r.horIdx, &r.surfIdx,
                        &r.pond, &r.psi0, &r.sink) != 15)
            die("bad node record");
    }

    unsigned m;
    if (std::fscanf(f, "%63s %u", tag, &m) != 2 || std::strcmp(tag, "LINKS"))
        die("bad LINKS header");
    struct LinkRec { unsigned a, b; int type; double area; };
    std::vector<LinkRec> links(m);
    for (unsigned i = 0; i < m; ++i)
        if (std::fscanf(f, "%u %u %d %lf", &links[i].a, &links[i].b,
                        &links[i].type, &links[i].area) != 4)
            die("bad link record");

    unsigned nSoil;
    if (std::fscanf(f, "%63s %u", tag, &nSoil) != 2 || std::strcmp(tag, "SOILS"))
        die("bad SOILS header");
    struct SoilRec { int s, h; double alpha, nn, mm, he, tr, ts, ks, L; };
    std::vector<SoilRec> soils(nSoil);
    for (unsigned i = 0; i < nSoil; ++i)
        if (std::fscanf(f, "%d %d %lf %lf %lf %lf %lf %lf %lf %lf",
                        &soils[i].s, &soils[i].h, &soils[i].alpha, &soils[i].nn,
                        &soils[i].mm, &soils[i].he, &soils[i].tr, &soils[i].ts,
                        &soils[i].ks, &soils[i].L) != 10)
            die("bad soil record");

    unsigned nSurfTypes;
    if (std::fscanf(f, "%63s %u", tag, &nSurfTypes) != 2
        || std::strcmp(tag, "SURFACES"))
        die("bad SURFACES header");
    std::vector<std::pair<int, double>> surfaces(nSurfTypes);
    for (unsigned i = 0; i < nSurfTypes; ++i)
        if (std::fscanf(f, "%d %lf", &surfaces[i].first,
                        &surfaces[i].second) != 2)
            die("bad surface record");

    double dtMin, dtMax, lvRatio;
    unsigned maxIter, maxApprox, tolExp, mbrExp;
    if (std::fscanf(f, "%63s %lf %lf %u %u %u %u %lf", tag, &dtMin, &dtMax,
                    &maxIter, &maxApprox, &tolExp, &mbrExp, &lvRatio) != 8
        || std::strcmp(tag, "PARAMS"))
        die("bad PARAMS header");

    unsigned hours;
    if (std::fscanf(f, "%63s %u", tag, &hours) != 2 || std::strcmp(tag, "HOURS"))
        die("bad HOURS header");

    // optional sections, any order:
    //   PRESC <k>      then k lines "<idx> <totalPotential>"
    //   CULVERTS <k>   then k lines "<idx> <rough> <slope> <width> <height>"
    //   SCHEDULE <h>   then h sink multipliers (storm-then-drainage soaks)
    //   HEAT <vapor> <advection> <initT> <airT> <RH> <wind> <netIrr>
    //        <hWind> <hT> <z0>
    bool withHeat = false;
    int heatVapor = 0, heatAdv = 0;
    double initT = 0, airT = 0, rhAir = 0, windS = 0, netIrr = 0;
    double hWind = 10.0, hTemp = 2.0, rough0 = 0.01;
    struct PrescRec { unsigned idx; double value; };
    struct CulvertRec { unsigned idx; double rough, slope, w, h; };
    std::vector<PrescRec> prescs;
    std::vector<CulvertRec> culverts;
    std::vector<double> schedule;
    while (std::fscanf(f, "%63s", tag) == 1) {
        if (std::strcmp(tag, "HEAT") == 0) {
            if (std::fscanf(f, "%d %d %lf %lf %lf %lf %lf %lf %lf %lf",
                            &heatVapor, &heatAdv, &initT, &airT, &rhAir,
                            &windS, &netIrr, &hWind, &hTemp, &rough0) != 10)
                die("bad HEAT record");
            withHeat = true;
        } else if (std::strcmp(tag, "PRESC") == 0) {
            unsigned k;
            if (std::fscanf(f, "%u", &k) != 1) die("bad PRESC header");
            prescs.resize(k);
            for (unsigned i = 0; i < k; ++i)
                if (std::fscanf(f, "%u %lf", &prescs[i].idx,
                                &prescs[i].value) != 2)
                    die("bad PRESC record");
        } else if (std::strcmp(tag, "CULVERTS") == 0) {
            unsigned k;
            if (std::fscanf(f, "%u", &k) != 1) die("bad CULVERTS header");
            culverts.resize(k);
            for (unsigned i = 0; i < k; ++i)
                if (std::fscanf(f, "%u %lf %lf %lf %lf", &culverts[i].idx,
                                &culverts[i].rough, &culverts[i].slope,
                                &culverts[i].w, &culverts[i].h) != 5)
                    die("bad CULVERTS record");
        } else if (std::strcmp(tag, "SCHEDULE") == 0) {
            unsigned k;
            if (std::fscanf(f, "%u", &k) != 1) die("bad SCHEDULE header");
            schedule.resize(k);
            for (unsigned i = 0; i < k; ++i)
                if (std::fscanf(f, "%lf", &schedule[i]) != 1)
                    die("bad SCHEDULE record");
        } else {
            die("unknown section tag");
        }
    }
    std::fclose(f);

    // ---- build the model through the public API ----
    check(initializeSF3D(n, nSurf, (u8_t)nLat, true, withHeat, false),
          "initializeSF3D");
    if (withHeat)
        check(initializeHeatFlag(heatFluxSaveMode_t::None, heatAdv != 0,
                                 heatVapor != 0),
              "initializeHeatFlag");
    setThreadsNumber((u8_t)nThreads);

    for (auto& s : soils)
        check(setSoilProperties((u16_t)s.s, (u8_t)s.h, s.alpha, s.nn, s.mm,
                                s.he, s.tr, s.ts, s.ks, s.L, 0.02, 25.0),
              "setSoilProperties");
    for (auto& s : surfaces)
        check(setSurfaceProperties((u16_t)s.first, s.second),
              "setSurfaceProperties");

    check(setNumericalParameters(dtMin, dtMax, (u16_t)maxIter, (u16_t)maxApprox,
                                 (u8_t)tolExp, (u8_t)mbrExp),
          "setNumericalParameters");
    check(setHydraulicProperties(WRCModel::ModifiedVanGenuchten,
                                 meanType_t::Logarithmic, (float)lvRatio),
          "setHydraulicProperties");

    for (auto& r : nodes)
        check(setNode(r.idx, r.x, r.y, r.z, r.vol, r.isSurf != 0,
                      (boundaryType_t)r.btype, r.slope, r.barea),
              "setNode");
    for (auto& l : links) {
        linkType_t t = l.type == 0 ? linkType_t::Up
                     : l.type == 1 ? linkType_t::Down : linkType_t::Lateral;
        check(setNodeLink(l.a, l.b, t, l.area), "setNodeLink");
    }
    for (auto& r : nodes) {
        if (r.isSurf) {
            check(setNodeSurface(r.idx, (u16_t)r.surfIdx), "setNodeSurface");
            check(setNodePond(r.idx, r.pond), "setNodePond");
        } else {
            check(setNodeSoil(r.idx, (u16_t)r.soilIdx, (u16_t)r.horIdx),
                  "setNodeSoil");
        }
        check(setNodeMatricPotential(r.idx, r.psi0), "setNodeMatricPotential");
        check(setNodeWaterSinkSource(r.idx, r.sink), "setNodeWaterSinkSource");
    }

    if (withHeat) {
        for (auto& r : nodes) {
            if (r.isSurf) continue;
            check(setNodeTemperature(r.idx, initT), "setNodeTemperature");
            if (r.btype == 8) {   // HeatSurface: atmospheric boundary data
                check(setNodeBoundaryTemperature(r.idx, airT), "setBndT");
                check(setNodeBoundaryRelativeHumidity(r.idx, rhAir),
                      "setBndRH");
                check(setNodeBoundaryWindSpeed(r.idx, windS), "setBndWind");
                check(setNodeBoundaryNetIrradiance(r.idx, netIrr),
                      "setBndIrr");
                check(setNodeBoundaryHeightWind(r.idx, hWind), "setBndHW");
                check(setNodeBoundaryHeightTemperature(r.idx, hTemp),
                      "setBndHT");
                check(setNodeBoundaryRoughness(r.idx, rough0), "setBndZ0");
            }
        }
    }

    for (auto& p : prescs)
        check(setNodePrescribedTotalPotential(p.idx, p.value),
              "setNodePrescribedTotalPotential");
    if (! culverts.empty()) {
        // upstream bug: initializeSF3D never allocates nodeGrid.culvertPtr
        // (the hostAlloc at soilFluxes3D.cpp:146 is commented out), so both
        // setCulvert (write, soilFluxes3D.cpp:586) and the water culvert
        // branch (read, water.cpp:750-755) dereference null. Allocate the
        // array here, driver-side, keeping the reference sources unmodified.
        nodeGrid.culvertPtr = new culvertData_t*[n]();
        for (auto& c : culverts)
            check(setCulvert(c.idx, c.rough, c.slope, c.w, c.h), "setCulvert");
    }

    check(initializeBalance(), "initializeBalance");

    const bool debugDt = std::getenv("REF_DEBUG_DT") != nullptr;
    // light trace: only the accepted dt sequence + per-step water MBR
    // (REF_DEBUG_DT dumps full per-step state — prohibitive at
    // catchment scale)
    const bool dtOnly = std::getenv("REF_DT_ONLY") != nullptr;
    for (unsigned h = 0; h < hours; ++h) {
        if (! schedule.empty()) {
            // per-hour sink multiplier (storm-then-drainage soak scenarios)
            double mult = h < schedule.size() ? schedule[h] : 0.0;
            for (auto& r : nodes)
                check(setNodeWaterSinkSource(r.idx, r.sink * mult),
                      "setNodeWaterSinkSource(schedule)");
        }
        if (debugDt) {
            // computePeriod inlined so each accepted dt can be reported
            double sum = 0.0;
            while (sum < 3600.0) {
                double dt = computeStep(3600.0 - sum);
                sum += dt;
                double maxSw = 0.0;
                for (unsigned i = 0; i < nSurf; ++i)
                    maxSw = std::max(maxSw, getNodeWaterContent(i));
                std::fprintf(stderr, "DT %g courant %g maxSw_mm %g\n", dt,
                             nodeGrid.CourantWater, maxSw * 1000.0);
                for (unsigned i = 0; i < n; ++i)
                    std::fprintf(stderr, "S %u %.17g\n", i,
                                 getNodeTotalPotential(i));
                for (unsigned i = 0; i < n; ++i)
                    std::fprintf(stderr, "SE %u %.17g %.17g\n", i,
                                 getNodeDegreeOfSaturation(i),
                                 getNodeWaterConductivity(i));
                for (unsigned i = 0; i < n; ++i)
                    std::fprintf(stderr, "WF %u %.17g %.17g\n", i,
                                 nodeGrid.waterData.waterFlow[i],
                                 nodeGrid.waterData.invariantFluxes[i]);
                // preconditioned stencil rows of the LAST assembled system
                // (vertical links only; getMatrixElementValue returns
                // -a_ij/diag_i after preconditioning)
                if (auto* cpu = dynamic_cast<CPUSolver*>(solver))
                    for (unsigned i = 0; i < n; ++i) {
                        auto up = nodeGrid.linkData[0].linkType[i] !=
                                  linkType_t::NoLink
                            ? nodeGrid.linkData[0].linkIndex[i] : i;
                        auto dn = nodeGrid.linkData[1].linkType[i] !=
                                  linkType_t::NoLink
                            ? nodeGrid.linkData[1].linkIndex[i] : i;
                        std::fprintf(stderr, "MX %u %.17g %.17g\n", i,
                            up != i ? cpu->getMatrixElementValue(i, up) : 0.0,
                            dn != i ? cpu->getMatrixElementValue(i, dn) : 0.0);
                    }
                if (withHeat)
                    for (unsigned i = nSurf; i < n; ++i)
                        std::fprintf(stderr, "ST %u %.17g\n", i,
                                     getNodeTemperature(i));
            }
        } else if (dtOnly) {
            double sum = 0.0;
            while (sum < 3600.0) {
                double dt = computeStep(3600.0 - sum);
                sum += dt;
                std::fprintf(stderr, "DTO %.17g %.17g %.17g\n", dt,
                             nodeGrid.CourantWater, getWaterMBR());
            }
        } else {
            auto t0 = std::chrono::steady_clock::now();
            computePeriod(3600.0);
            double wall = std::chrono::duration<double>(
                std::chrono::steady_clock::now() - t0).count();
            // benchmark anchor: wall-clock per simulated hour (stderr so the
            // golden-parity output format is unchanged)
            std::fprintf(stderr, "TIME %u %.3f\n", h, wall);
        }
        std::fprintf(out, "HOUR %u %.17g\n", h, getWaterMBR());
        for (unsigned i = 0; i < n; ++i)
            std::fprintf(out, "%u %.17g\n", i, getNodeTotalPotential(i));
        if (withHeat) {
            // whole-period heat mass-balance ratio: the reference-side
            // anchor for bench.py's coupled_heat_mbr
            // (updateHeatBalanceDataWholePeriod, heat.cpp:400-410)
            std::fprintf(out, "HEATMBR %u %.17g\n", h, getHeatMBR());
            for (unsigned i = nSurf; i < n; ++i)
                std::fprintf(out, "T %u %.17g\n", i, getNodeTemperature(i));
        }
    }
    std::fclose(out);
    cleanSF3D();
    return 0;
}
