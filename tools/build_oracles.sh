#!/bin/bash
# Build golden-oracle CLIs from the reference's vendored decoder libraries
# (read-only at /root/reference/thirdparty) into .oracle_build/ (gitignored).
# The oracles give the conformance suite bit-exact ground truth from the
# exact library versions the reference product ships.  Reference code is
# compiled in place, never copied into this repo.
set -euo pipefail
REF=${REF:-/root/reference/thirdparty}
OUT=${OUT:-$(dirname "$0")/../.oracle_build}
mkdir -p "$OUT"
OUT=$(cd "$OUT" && pwd)

build_flac() {
  local src="$REF/flac-1.2.1"
  [ -d "$src" ] || { echo "no flac source"; return 1; }
  local obj="$OUT/flac_obj"; mkdir -p "$obj"
  local cfg="$OUT/flac_cfg"; mkdir -p "$cfg/FLAC"
  # minimal config.h: the library only needs these on linux/x86_64
  cat > "$cfg/config.h" <<'EOF'
#define FLAC__NO_ASM 1
#define FLAC__HAS_OGG 0
#define CPU_IS_LITTLE_ENDIAN 1
#define CPU_IS_BIG_ENDIAN 0
#define FLAC__ALIGN_MALLOC_DATA 1
#define HAVE_INTTYPES_H 1
#define HAVE_STDINT_H 1
#define SIZEOF_VOIDP 8
#define VERSION "1.2.1"
EOF
  local cflags="-O2 -DHAVE_CONFIG_H -I$cfg -I$src/include -I$src/src/libFLAC/include -w"
  local objs=()
  for c in bitmath bitreader bitwriter cpu crc fixed float format lpc md5 \
           memory stream_decoder stream_encoder stream_encoder_framing window; do
    gcc $cflags -c "$src/src/libFLAC/$c.c" -o "$obj/$c.o"
    objs+=("$obj/$c.o")
  done
  gcc -O2 -I"$src/include" -w "$(dirname "$0")/flac_oracle.c" \
      "${objs[@]}" -lm -o "$OUT/flac_oracle"
  echo "built $OUT/flac_oracle"
}

build_aac() {
  local src="$REF/fdk-aac"
  [ -d "$src" ] || { echo "no fdk-aac source"; return 1; }
  local obj="$OUT/fdk_obj"; mkdir -p "$obj"
  local inc=""
  for lib in libAACdec libAACenc libFDK libSYS libMpegTPDec libMpegTPEnc \
             libSBRdec libSBRenc libPCMutils; do
    inc="$inc -I$src/$lib/include"
  done
  local objs=()
  for lib in libAACdec libAACenc libFDK libSYS libMpegTPDec libMpegTPEnc \
             libSBRdec libSBRenc libPCMutils; do
    for c in "$src/$lib/src"/*.cpp; do
      local o="$obj/${lib}_$(basename "$c" .cpp).o"
      [ -f "$o" ] || g++ -O2 $inc -w -fno-exceptions -c "$c" -o "$o"
      objs+=("$o")
    done
  done
  gcc -O2 $inc -w -c "$(dirname "$0")/aac_oracle.c" -o "$obj/aac_oracle.o"
  g++ -O2 "$obj/aac_oracle.o" "${objs[@]}" -lm -o "$OUT/aac_oracle"
  echo "built $OUT/aac_oracle"
  g++ -O2 $inc -w -fno-exceptions "$(dirname "$0")/sbr_probe.cpp" \
      "$obj"/libFDK_*.o "$obj"/libSYS_*.o -lm -o "$OUT/sbr_probe"
  echo "built $OUT/sbr_probe"
}

build_mad() {
  local src="$REF/libmad-0.15.1b"
  [ -d "$src" ] || { echo "no libmad source"; return 1; }
  local obj="$OUT/mad_obj"; mkdir -p "$obj"
  local cfg="$OUT/mad_cfg"; mkdir -p "$cfg"
  cat > "$cfg/config.h" <<'EOF'
#define FPM_64BIT 1
#define SIZEOF_INT 4
#define SIZEOF_LONG 8
#define SIZEOF_LONG_LONG 8
#define HAVE_ASSERT_H 1
#define HAVE_LIMITS_H 1
EOF
  local cflags="-O2 -DHAVE_CONFIG_H -DFPM_64BIT -I$cfg -I$src -w"
  local objs=()
  for c in bit decoder fixed frame huffman layer12 layer3 stream synth \
           timer version; do
    gcc $cflags -c "$src/$c.c" -o "$obj/$c.o"
    objs+=("$obj/$c.o")
  done
  gcc $cflags "$(dirname "$0")/mad_oracle.c" "${objs[@]}" -lm \
      -o "$OUT/mad_oracle"
  echo "built $OUT/mad_oracle"
}

build_alac() {
  local src="$REF/apple_alac/codec"
  [ -d "$src" ] || { echo "no apple_alac source"; return 1; }
  local obj="$OUT/alac_obj"; mkdir -p "$obj"
  local objs=()
  for c in ALACDecoder ALACEncoder; do
    g++ -O2 -I"$src" -w -c "$src/$c.cpp" -o "$obj/$c.o"
    objs+=("$obj/$c.o")
  done
  for c in ALACBitUtilities EndianPortable ag_dec ag_enc dp_dec dp_enc \
           matrix_dec matrix_enc; do
    gcc -O2 -I"$src" -w -c "$src/$c.c" -o "$obj/$c.o"
    objs+=("$obj/$c.o")
  done
  g++ -O2 -I"$src" -w "$(dirname "$0")/alac_oracle.cpp" "${objs[@]}" \
      -o "$OUT/alac_oracle"
  echo "built $OUT/alac_oracle"
}

build_vorbis() {
  local src="$REF/Tremor"
  local oggsrc="$REF/libogg"
  [ -d "$src" ] || { echo "no Tremor source"; return 1; }
  local obj="$OUT/vorbis_obj"; mkdir -p "$obj"
  local objs=()
  local cflags="-O2 -I$src -I$oggsrc/include -w"
  for c in bitwise framing; do
    gcc $cflags -c "$oggsrc/src/$c.c" -o "$obj/ogg_$c.o"
    objs+=("$obj/ogg_$c.o")
  done
  for c in block codebook floor0 floor1 info mapping0 mdct registry \
           res012 sharedbook synthesis vorbisfile window; do
    gcc $cflags -c "$src/$c.c" -o "$obj/$c.o"
    objs+=("$obj/$c.o")
  done
  gcc $cflags "$(dirname "$0")/vorbis_oracle.c" "${objs[@]}" -lm \
      -o "$OUT/vorbis_oracle"
  echo "built $OUT/vorbis_oracle"
}

build_opus() {
  local src="$REF/opus-1.5.2"
  local oggsrc="$REF/libogg"
  [ -d "$src" ] || { echo "no opus source"; return 1; }
  local obj="$OUT/opus_build"
  if [ ! -f "$obj/libopus.a" ]; then
    cmake -S "$src" -B "$obj" -G Ninja -DCMAKE_BUILD_TYPE=Release \
          -DOPUS_BUILD_TESTING=OFF -DOPUS_BUILD_PROGRAMS=OFF \
          -DOPUS_BUILD_SHARED_LIBRARY=OFF -DOPUS_X86_MAY_HAVE_AVX2=OFF \
          > /dev/null
    cmake --build "$obj" --target opus -j2 > /dev/null
  fi
  local oobj="$OUT/vorbis_obj"; mkdir -p "$oobj"
  for c in bitwise framing; do
    [ -f "$oobj/ogg_$c.o" ] || \
      gcc -O2 -I"$oggsrc/include" -w -c "$oggsrc/src/$c.c" -o "$oobj/ogg_$c.o"
  done
  gcc -O2 -I"$src/include" -I"$src/src" -I"$src/celt" -I"$src" \
      -I"$oggsrc/include" -w \
      "$(dirname "$0")/opus_oracle.c" "$oobj/ogg_bitwise.o" \
      "$oobj/ogg_framing.o" "$obj/libopus.a" -lm -o "$OUT/opus_oracle"
  echo "built $OUT/opus_oracle"
  gcc -O2 -DVAR_ARRAYS -DOPUS_BUILD -I"$src/include" -I"$src/celt" -I"$src" \
      -I"$obj" -w "$(dirname "$0")/celt_probe.c" "$obj/libopus.a" -lm \
      -o "$OUT/celt_probe"
  echo "built $OUT/celt_probe"
  gcc -O2 -DVAR_ARRAYS -DOPUS_BUILD -I"$src/include" -I"$src/celt" \
      -I"$src/silk" -I"$src" -I"$obj" -w "$(dirname "$0")/silk_probe.c" \
      "$obj/libopus.a" -lm -o "$OUT/silk_probe"
  echo "built $OUT/silk_probe"
}

case "${1:-all}" in
  flac) build_flac ;;
  aac) build_aac ;;
  mad) build_mad ;;
  alac) build_alac ;;
  vorbis) build_vorbis ;;
  opus) build_opus ;;
  all) build_flac; build_aac; build_mad; build_alac; build_vorbis; \
       build_opus ;;
esac
