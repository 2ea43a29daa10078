// Qt-free stand-in for the reference's optional "lineal" dynamic solver
// bridge (agrolib/soilFluxes3D/lineal/linealiaLib.h). The golden runner
// never enables useLineal, so these methods must exist but are never called.
#ifndef LINEALIALIB_H
#define LINEALIALIB_H

#pragma once

#include <cstdlib>
#include "linealia.hpp"

class LinealiaLib {
public:
    static LinealiaLib& instance() {
        static LinealiaLib lib;
        return lib;
    }

    bool load() { return false; }
    bool isLoaded() const { return false; }

    LinealiaIterativeResult solveSOR(LinealiaMatrix, LinealiaVector, LinealiaVector,
                                     LinealExecutionParams,
                                     LinealiaIterativeSolverParams,
                                     LinealiaRelaxedParams) { std::abort(); }

    LinealiaIterativeResult solveSSOR(LinealiaMatrix, LinealiaVector, LinealiaVector,
                                      LinealExecutionParams,
                                      LinealiaIterativeSolverParams,
                                      LinealiaRelaxedParams) { std::abort(); }

    LinealiaIterativeResult solveCG(LinealiaMatrix, LinealiaVector, LinealiaVector,
                                    LinealExecutionParams,
                                    LinealiaIterativeSolverParams) { std::abort(); }

    LinealiaIterativeResult solvePCG_SOR(LinealiaMatrix, LinealiaVector, LinealiaVector,
                                         LinealExecutionParams,
                                         LinealiaIterativeSolverParams,
                                         LinealiaRelaxedPreconditionerParams) { std::abort(); }

    LinealiaIterativeResult solvePCG_SSOR(LinealiaMatrix, LinealiaVector, LinealiaVector,
                                          LinealExecutionParams,
                                          LinealiaIterativeSolverParams,
                                          LinealiaRelaxedPreconditionerParams) { std::abort(); }

    LinealiaIterativeResult solvePCG_AMG_SOR(LinealiaMatrix, LinealiaVector, LinealiaVector,
                                             LinealExecutionParams,
                                             LinealiaIterativeSolverParams,
                                             LinealiaPcgAmgParams) { std::abort(); }

    LinealiaIterativeResult solvePCG_AMG_SSOR(LinealiaMatrix, LinealiaVector, LinealiaVector,
                                              LinealExecutionParams,
                                              LinealiaIterativeSolverParams,
                                              LinealiaPcgAmgParams) { std::abort(); }

private:
    LinealiaLib() = default;
};

#endif
