#!/usr/bin/env python3
"""Diagnostic build: aac_oracle_instr with an alpha-dumping lppTransposer.

Copies fdk's lpp_tran.cpp (reference stays read-only/untouched) into
.oracle_build/instr/, inserts env-gated dump hooks, compiles it, and
relinks aac_oracle_instr against the existing oracle objects.  With
SBR_LPC_DUMP=<path> the instrumented decoder writes, per lppTransposer
call:

  B <call> <firstSlotOffs> <lastSlotOffs> <nInvf> <bwVector raw Q31...>
  A <call> <loBand> <a0r> <a0i> <a1r> <a1i> <reset> <dynScale> <ovShift>
    <lbShift>                      (alphas raw FIXP_SGL Q15-of-alpha/4)
  X <call> <loBand> <re im ...>    (scaled int32 lowBand buffer, 40 pairs)

This is measurement scaffolding for the fixed-point transposer
transcription (fdk lpp_tran.cpp:371-520 + libFDK autocorr2nd.cpp) —
NOT part of the conformance suite build.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, ".oracle_build")
REF = os.environ.get("REF", "/root/reference/thirdparty")
SRC = os.path.join(REF, "fdk-aac/libSBRdec/src/lpp_tran.cpp")

FILE_SCOPE = """
#include <stdio.h>
#include <stdlib.h>
static FILE *sbr_dumpf_;
static int sbr_dumpcall_ = -1;
"""

ENTRY_HOOK = """
  { static int init_ = 0;
    if (!init_) { const char *p_ = getenv("SBR_LPC_DUMP");
                  if (p_) sbr_dumpf_ = fopen(p_, "w"); init_ = 1; }
    if (sbr_dumpf_) {
      sbr_dumpcall_++;
      fprintf(sbr_dumpf_, "B %d %d %d %d", sbr_dumpcall_, firstSlotOffs,
              lastSlotOffs, nInvfBands);
      for (int q_ = 0; q_ < nInvfBands; q_++)
        fprintf(sbr_dumpf_, " %d", (int)bwVector[q_]);
      fprintf(sbr_dumpf_, "\\n");
    } }
"""

ALPHA_HOOK = """
    if (sbr_dumpf_) {
      fprintf(sbr_dumpf_, "A %d %d %d %d %d %d %d %d %d %d %d\\n",
              sbr_dumpcall_, loBand, (int)alphar[0], (int)alphai[0],
              (int)alphar[1], (int)alphai[1], resetLPCCoeffs,
              dynamicScale, ovLowBandShift, lowBandShift, comLowBandScale);
      fprintf(sbr_dumpf_, "X %d %d", sbr_dumpcall_, loBand);
      for (int i_ = 0;
           i_ < LPC_ORDER + pSettings->overlap + pSettings->nCols; i_++)
        fprintf(sbr_dumpf_, " %d %d", (int)lowBandReal[i_],
                (int)lowBandImag[i_]);
      fprintf(sbr_dumpf_, "\\n");
    }
"""


PATCH_HOOK = """
  if (sbr_dumpf_) {
    int tstop_ = patchParam[pSettings->noOfPatches-1].targetStartBand
               + patchParam[pSettings->noOfPatches-1].numBandsInPatch;
    for (int i_ = startSample; i_ < stopSample; i_++) {
      fprintf(sbr_dumpf_, "P %d %d %d", sbr_dumpcall_, i_, comLowBandScale);
      for (int k_ = patchParam[0].targetStartBand; k_ < tstop_; k_++)
        fprintf(sbr_dumpf_, " %d %d", (int)qmfBufferReal[i_][k_],
                (int)qmfBufferImag[i_][k_]);
      fprintf(sbr_dumpf_, "\\n");
    }
  }
"""

ENV_SCOPE = """
#include <stdio.h>
#include <stdlib.h>
#include <math.h>
static FILE *env_dumpf_;
static int env_dumpcall_ = -1;
static double env_val_(int m, int e) {
  return ((double)m / 2147483648.0) * pow(2.0, (double)e);
}
"""

# anchor: after the output rescale at the end of calculateSbrEnvelope;
# dump the final adjusted buffer (new slots, SBR bins) + its exponent
ADJ_HOOK = """
    if (env_dumpf_) {
      for (int j_ = 0; j_ < no_cols; j_++) {
        fprintf(env_dumpf_, "Q %d %d %d %d %d", env_dumpcall_, j_,
                (int)output_e, lowSubband, highSubband);
        for (int k_ = lowSubband; k_ < highSubband; k_++)
          fprintf(env_dumpf_, " %d %d", (int)analysBufferReal[j_][k_],
                  (int)analysBufferImag[j_][k_]);
        fprintf(env_dumpf_, "\\n");
      }
    }
"""

# anchor: the sqrt-conversion loop end in calculateSbrEnvelope; dump the
# final amplitude gains / noise / sine levels + unbiased ref/est energies
ENV_HOOK = """
    { static int init_ = 0;
      if (!init_) { const char *p_ = getenv("SBR_ENV_DUMP");
                    if (p_) env_dumpf_ = fopen(p_, "w"); init_ = 1; }
      if (env_dumpf_) {
        if (i == 0) {
          env_dumpcall_++;
          fprintf(env_dumpf_, "T %d %d %d %d %d", env_dumpcall_,
                  (int)hFrameData->frameInfo.tranEnv,
                  (int)h_sbr_cal_env->prevTranEnv,
                  (int)hFrameData->frameInfo.nEnvelopes,
                  (int)hFrameData->frameInfo.frameClass);
          for (int b_ = 0; b_ <= hFrameData->frameInfo.nEnvelopes; b_++)
            fprintf(env_dumpf_, " %d",
                    (int)hFrameData->frameInfo.borders[b_]);
          fprintf(env_dumpf_, "\\n");
        }
        fprintf(env_dumpf_, "E %d %d %d %d", env_dumpcall_, i,
                noSubbands, lowSubband);
        for (int k_ = 0; k_ < noSubbands; k_++)
          fprintf(env_dumpf_, " %.9e %.9e %.9e %.9e %.9e",
                  env_val_((int)pNrgs->nrgGain[k_], pNrgs->nrgGain_e[k_]),
                  env_val_((int)pNrgs->noiseLevel[k_], noise_e),
                  env_val_((int)pNrgs->nrgSine[k_], noise_e),
                  env_val_((int)pNrgs->nrgRef[k_], pNrgs->nrgRef_e[k_]),
                  env_val_((int)pNrgs->nrgEst[k_], pNrgs->nrgEst_e[k_]));
        fprintf(env_dumpf_, "\\n");
      } }
"""


PS_SCOPE = """
#include <stdio.h>
#include <stdlib.h>
static FILE *ps_dumpf_;
static int ps_slot_ = -1;
"""

# anchor: end of deCorrelateSlotBased, before the headroom rescale —
# dump the decorrelated right (d) signal: 12 hybrid + qmf bands 3..63
PS_HOOK = """
  { static int init_ = 0;
    if (!init_) { const char *p_ = getenv("SBR_PS_DUMP");
                  if (p_) ps_dumpf_ = fopen(p_, "w"); init_ = 1; }
    if (ps_dumpf_) {
      ps_slot_++;
      fprintf(ps_dumpf_, "D %d", ps_slot_);
      for (int k_ = 0; k_ < 12; k_++)
        fprintf(ps_dumpf_, " %d %d", (int)mHybridRealRight[k_],
                (int)mHybridImagRight[k_]);
      for (int k_ = 3; k_ < 64; k_++)
        fprintf(ps_dumpf_, " %d %d", (int)rIntBufferRight[k_],
                (int)iIntBufferRight[k_]);
      fprintf(ps_dumpf_, "\\n");
      fprintf(ps_dumpf_, "L %d", ps_slot_);
      for (int k_ = 0; k_ < 12; k_++)
        fprintf(ps_dumpf_, " %d %d", (int)mHybridRealLeft[k_],
                (int)mHybridImagLeft[k_]);
      for (int k_ = 3; k_ < 64; k_++)
        fprintf(ps_dumpf_, " %d %d", (int)rIntBufferLeft[k_],
                (int)iIntBufferLeft[k_]);
      fprintf(ps_dumpf_, "\\n");
    } }
"""


PS_IDX_HOOK = """
    if (ps_dumpf_)
      fprintf(ps_dumpf_, "I %d %d %d %d %d\\n", ps_slot_, (int)env,
              (int)group, (int)h_ps_d->specificTo.mpeg.coef.aaIidIndexMapped[env][bin],
              (int)h_ps_d->specificTo.mpeg.coef.aaIccIndexMapped[env][bin]);
"""

PS_H_HOOK = """
  if (ps_dumpf_) {
    fprintf(ps_dumpf_, "H %d", ps_slot_);
    for (int g_ = 0; g_ < NO_IID_GROUPS; g_++)
      fprintf(ps_dumpf_, " %d %d %d %d",
              (int)h_ps_d->specificTo.mpeg.coef.H11r[g_],
              (int)h_ps_d->specificTo.mpeg.coef.H12r[g_],
              (int)h_ps_d->specificTo.mpeg.coef.H21r[g_],
              (int)h_ps_d->specificTo.mpeg.coef.H22r[g_]);
    fprintf(ps_dumpf_, "\\n");
  }
}
"""


def patch_ps(out_dir):
    src = os.path.join(REF, "fdk-aac/libSBRdec/src/psdec.cpp")
    text = open(src, encoding="latin-1").read()
    anchor = '#include "psdec.h"'
    assert anchor in text, "ps include anchor missing"
    text = text.replace(anchor, anchor + PS_SCOPE, 1)
    anchor = """  scaleValues( &rIntBufferLeft[NO_QMF_BANDS_HYBRID20],  NO_QMF_CHANNELS-NO_QMF_BANDS_HYBRID20, -SCAL_HEADROOM );"""
    assert anchor in text, "ps dump anchor missing"
    text = text.replace(anchor, PS_HOOK + anchor, 1)
    # per-slot interpolated H: replace applySlotBasedRotation's closing
    # brace (the '}' right after the subband loop's end) with the dump.
    anchor = """      HybrLeftImag [subband] = tmpLeft;
      HybrRightImag[subband] = tmpRight;

    } /* subband */
  }
}"""
    anchor = """    AlphasValue = 0;
    if (h_ps_d->specificTo.mpeg.coef.aaIccIndexMapped[env][bin] >= 0)
      AlphasValue = Alphas[h_ps_d->specificTo.mpeg.coef.aaIccIndexMapped[env][bin]];"""
    assert anchor in text, "ps idx anchor missing"
    text = text.replace(anchor, anchor + PS_IDX_HOOK, 1)
    anchor = """      HybrLeftImag [subband] = tmpLeft;
      HybrRightImag[subband] = tmpRight;

    } /* subband */
  }
}"""
    assert anchor in text, "ps H anchor missing"
    text = text.replace(anchor, """      HybrLeftImag [subband] = tmpLeft;
      HybrRightImag[subband] = tmpRight;

    } /* subband */
  }""" + PS_H_HOOK, 1)
    patched = os.path.join(out_dir, "psdec_instr.cpp")
    open(patched, "w", encoding="latin-1").write(patched_text(text))
    return patched


def patched_text(t):
    return t


def patch_env(out_dir):
    src = os.path.join(REF, "fdk-aac/libSBRdec/src/env_calc.cpp")
    text = open(src, encoding="latin-1").read()
    anchor = '#include "transcendent.h"'
    assert anchor in text, "env include anchor missing"
    text = text.replace(anchor, anchor + ENV_SCOPE, 1)
    anchor = """    for (k=0; k<noSubbands; k++) {
      FDK_sqrt_MantExp(&pNrgs->nrgSine[k],    &pNrgs->nrgSine_e[k],    &noise_e);
      FDK_sqrt_MantExp(&pNrgs->nrgGain[k],    &pNrgs->nrgGain_e[k],    &pNrgs->nrgGain_e[k]);
      FDK_sqrt_MantExp(&pNrgs->noiseLevel[k], &pNrgs->noiseLevel_e[k], &noise_e);
    }"""
    assert anchor in text, "env sqrt anchor missing"
    text = text.replace(anchor, anchor + ENV_HOOK, 1)
    anchor = """    /* Rescale new samples */
    rescaleSubbandSamples( analysBufferReal,
                           (useLP) ? NULL : analysBufferImag,
                           lowSubband, highSubband,
                           first_start, no_cols,
                           adj_e - output_e);
  }"""
    assert anchor in text, "env adj anchor missing"
    text = text.replace(anchor, anchor + ADJ_HOOK, 1)
    patched = os.path.join(out_dir, "env_calc_instr.cpp")
    open(patched, "w", encoding="latin-1").write(text)
    return patched


def main():
    text = open(SRC, encoding="latin-1").read()
    # file-scope statics after the last #include
    anchor = '#include "genericStds.h"'
    assert anchor in text, "include anchor missing"
    text = text.replace(anchor, anchor + FILE_SCOPE, 1)
    anchor = ("  inverseFilteringLevelEmphasis(hLppTrans, nInvfBands, "
              "sbr_invf_mode, sbr_invf_mode_prev, bwVector);")
    assert anchor in text, "entry anchor missing"
    text = text.replace(anchor, anchor + ENTRY_HOOK, 1)
    anchor = """    if(resetLPCCoeffs){
      alphar[0] = FL2FXCONST_SGL(0.0f);
      alphar[1] = FL2FXCONST_SGL(0.0f);
      if (!useLP)
      {
        alphai[0] = FL2FXCONST_SGL(0.0f);
        alphai[1] = FL2FXCONST_SGL(0.0f);
      }
    }"""
    assert anchor in text, "reset anchor missing"
    text = text.replace(anchor, anchor + ALPHA_HOOK, 1)
    anchor = """ for (i = 0; i < nInvfBands; i++ ) {
   hLppTrans->bwVectorOld[i] = bwVector[i];
 }"""
    assert anchor in text, "patch anchor missing"
    text = text.replace(anchor, PATCH_HOOK + anchor, 1)

    instr = os.path.join(OUT, "instr")
    os.makedirs(instr, exist_ok=True)
    patched = os.path.join(instr, "lpp_tran_instr.cpp")
    open(patched, "w", encoding="latin-1").write(text)

    fdk = os.path.join(REF, "fdk-aac")
    inc = []
    for lib in ("libAACdec libAACenc libFDK libSYS libMpegTPDec "
                "libMpegTPEnc libSBRdec libSBRenc libPCMutils").split():
        inc.append("-I" + os.path.join(fdk, lib, "include"))
        inc.append("-I" + os.path.join(fdk, lib, "src"))
    obj = os.path.join(instr, "lpp_tran_instr.o")
    subprocess.run(["g++", "-O2", *inc, "-w", "-fno-exceptions", "-c",
                    patched, "-o", obj], check=True)
    env_patched = patch_env(instr)
    env_obj = os.path.join(instr, "env_calc_instr.o")
    subprocess.run(["g++", "-O2", *inc, "-w", "-fno-exceptions", "-c",
                    env_patched, "-o", env_obj], check=True)
    ps_patched = patch_ps(instr)
    ps_obj = os.path.join(instr, "psdec_instr.o")
    subprocess.run(["g++", "-O2", *inc, "-w", "-fno-exceptions", "-c",
                    ps_patched, "-o", ps_obj], check=True)
    fdk_obj = os.path.join(OUT, "fdk_obj")
    objs = [os.path.join(fdk_obj, f) for f in os.listdir(fdk_obj)
            if f.endswith(".o")
            and f not in ("libSBRdec_lpp_tran.o", "libSBRdec_env_calc.o",
                          "libSBRdec_psdec.o", "aac_oracle.o")]
    subprocess.run(["g++", "-O2", os.path.join(fdk_obj, "aac_oracle.o"),
                    obj, env_obj, ps_obj, *objs, "-lm", "-o",
                    os.path.join(OUT, "aac_oracle_instr")], check=True)
    print("built", os.path.join(OUT, "aac_oracle_instr"))


if __name__ == "__main__":
    sys.exit(main())
