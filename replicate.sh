#! /bin/bash
# Staged replication pipeline — parity with the reference's replicate.sh
# (8 stages, stage/stop_stage controls).  The MATLAB contamination stage is
# replaced by the Python/JAX pipeline (eval/contamination/*.py), so no
# MATLAB installation is required.

# Specify data directories
DATA_DIR=${DATA_DIR:-/data/KeywordReading}
NORM_DIR=${NORM_DIR:-/data/SyllableRepetition}
LIVE_DIR=${LIVE_DIR:-/data/KeywordReading/online_sessions}
TEMP_DIR=${TEMP_DIR:-/tmp/ReplicateDelayedSynthesis}

settings=${SETTINGS:-config/debug_settings.ini}

stage=${stage:-1}
stop_stage=${stop_stage:-8}

set -e
cd "$(dirname "$0")"

# -------------------------------------------------------------------------
# STAGE 1: CONTAMINATION ANALYSIS (Python/JAX — no MATLAB needed)
# -------------------------------------------------------------------------
if [ ${stage} -le 1 ] && [ ${stop_stage} -ge 1 ]; then
  echo "Stage 1: Running the contamination analysis part"
  mkdir -p $TEMP_DIR/contamination
  python eval/contamination/aggregate_per_day.py         \
    --corpus-root $DATA_DIR                              \
    --acc-path $TEMP_DIR/contamination/aggregated_by_day \
    --timing-path $TEMP_DIR/contamination/timings

  mkdir -p $TEMP_DIR/contamination/analysis
  python eval/contamination/contamination_analysis.py    \
    --agg-path $TEMP_DIR/contamination/aggregated_by_day \
    --out $TEMP_DIR/contamination/analysis

  mkdir -p $TEMP_DIR/analysis
  python eval/contamination/gen_contamination_report.py  \
    $TEMP_DIR/contamination                              \
    --out $TEMP_DIR/analysis
fi

# -------------------------------------------------------------------------
# STAGE 2: PREPARE DATA & COMPUTE HIGH-GAMMA FEATURES
# -------------------------------------------------------------------------
corpus_dir=$TEMP_DIR/corpus
if [ ${stage} -le 2 ] && [ ${stop_stage} -ge 2 ]; then
    echo "Stage 2: Precompute features for train, validation and test set"
    mkdir -p $corpus_dir
    python apps/prepare_corpus.py $corpus_dir $NORM_DIR $DATA_DIR
fi

# -------------------------------------------------------------------------
# STAGE 3: TRAIN THE UNIDIRECTIONAL VAD MODEL
# -------------------------------------------------------------------------
if [ ${stage} -le 3 ] && [ ${stop_stage} -ge 3 ]; then
    echo "Stage 3: Train nVAD model"
    python apps/train_unidirectional_vad.py $corpus_dir $TEMP_DIR/nVAD  \
      --test_day 2022_11_03                                             \
      --val_day 2022_11_04                                              \
      --epochs 8
fi

# -------------------------------------------------------------------------
# STAGE 4: TRAIN THE BIDIRECTIONAL DECODING MODEL
# -------------------------------------------------------------------------
if [ ${stage} -le 4 ] && [ ${stop_stage} -ge 4 ]; then
    echo "Stage 4: Train bidirectional decoding model"
    python apps/train_bidirectional_model.py $corpus_dir $TEMP_DIR/decoding_model  \
      --test_day 2022_11_03                                                        \
      --val_day 2022_11_04                                                         \
      --epochs 20
fi

# -------------------------------------------------------------------------
# STAGE 5: COMPUTE DAY SPECIFIC NORMALIZATION STATISTICS
# -------------------------------------------------------------------------
if [ ${stage} -le 5 ] && [ ${stop_stage} -ge 5 ]; then
    echo "Stage 5: Compute day specific normalization statistics"
    python apps/baseline_offline.py $settings --overwrite
fi

# -------------------------------------------------------------------------
# STAGE 6: RENDER POWER SPECTRAL ANALYSIS PLOT
# -------------------------------------------------------------------------
FIG_DAY=${FIG_DAY:-2022_09_22}
if [ ${stage} -le 6 ] && [ ${stop_stage} -ge 6 ]; then
    echo "Stage 6: Generate supplementary figure 2"
    mkdir -p $TEMP_DIR/analysis
    python eval/suppl_fig_2.py                             \
      $DATA_DIR/$FIG_DAY/KeywordReading_Overt_R01.mat      \
      $NORM_DIR/$FIG_DAY/SyllableRepetition_Overt.mat      \
      --out $TEMP_DIR/analysis
fi

# -------------------------------------------------------------------------
# STAGE 7: STREAM DATA LOCALLY USING THE DEVELOPMENT AMPLIFIER
# -------------------------------------------------------------------------
if [ ${stage} -le 7 ] && [ ${stop_stage} -ge 7 ]; then
    echo "Stage 7: Play one file from the online test days locally (60 seconds)"
    # When stage 8 runs in the same invocation, hold the amplifier back
    # until the decoder reports readiness in its run log ("starting
    # sources") — its warm-up compiles take minutes on slow backends and
    # contend with the amplifier's own startup on small hosts.  The wait is
    # capped at AMP_MAX_WAIT seconds (default 900); AMP_START_DELAY adds a
    # fixed sleep before the gate (default 0, the reference's behavior).
    run_log="$(awk -F' *= *' '$1 == "base_out_dir" {print $2}' "$settings")/replicate/log.run.txt"
    if [ ${stop_stage} -ge 8 ]; then
      rm -f "$run_log"   # a stale log would satisfy the gate prematurely
    fi
    ( sleep ${AMP_START_DELAY:-0}
      if [ ${stop_stage} -ge 8 ]; then
        waited=0
        until grep -qs "starting sources" "$run_log"; do
          sleep 2; waited=$((waited + 2))
          [ ${waited} -ge ${AMP_MAX_WAIT:-900} ] && break
        done
      fi
      exec python apps/development_amplifier.py $LIVE_DIR/2023_04_14/KeywordSynthesis_Overt_R01.mat --seconds 60 ) &
fi

# -------------------------------------------------------------------------
# STAGE 8: START ONLINE DECODER
# -------------------------------------------------------------------------
if [ ${stage} -le 8 ] && [ ${stop_stage} -ge 8 ]; then
    echo "Stage 8: Starting online decoder (close using CTRL-C)"
    if command -v play >/dev/null 2>&1; then
        python apps/decode_online.py $settings --run replicate --overwrite |  \
          play -t raw -r 16000 -e signed -b 16 -c 1 --buffer 256 -V0 -q -
    else
        echo "play (SoX) not installed - writing PCM to $TEMP_DIR/replicate_audio.pcm"
        python apps/decode_online.py $settings --run replicate --overwrite \
          > $TEMP_DIR/replicate_audio.pcm
    fi
fi
