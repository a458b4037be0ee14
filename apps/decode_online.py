"""Closed-loop speech neuroprosthesis: the flagship online entry point.

Parity target: reference decode_online.py — builds the same system graph
(ZMQ ingest -> high-gamma features -> nVAD speech gating -> bidirectional
decode -> vocoder -> SoX stdout, with raw/HGA/VAD/LPC/wav logging taps),
configured from the same INI schema, writing the same log-file formats, so
``replicate.sh`` stage 8 runs unchanged against this backend.
"""

import argparse
import configparser
import json
import logging
import os
import sys
from pathlib import Path
from typing import Any, Iterable, Optional, Tuple

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import dss_tpu.runtime as ez  # noqa: E402
from dss_tpu.models import (  # noqa: E402
    BidirectionalSpeechSynthesisModel,
    UnidirectionalVoiceActivityDetector,
)
from dss_tpu.ops import (  # noqa: E402
    CommonAverageReferencing,
    ZScoreNormalization,
)
from dss_tpu.runtime.units import (  # noqa: E402
    BinaryLogger,
    FusedDecoderVocoder,
    FusedDecoderVocoderSettings,
    FusedFrontendVad,
    FusedFrontendVadSettings,
    DelayedLPCNetVocoder,
    DelayedLPCNetVocoderSettings,
    DelayedStdoutForSoX,
    DelayedWavLogger,
    DelayedWavLoggerSettings,
    FilterSpeechSegments,
    FilterSpeechSegmentsSettings,
    HighGammaActivity,
    HighGammaActivitySettings,
    LoggerSettings,
    RecurrentNeuralDecodingModel,
    RecurrentNeuralDecodingModelSettings,
    VoiceActivityDetectionLogger,
    ZMQConnector,
    ZMQConnectorSettings,
)
from dss_tpu.utils import (  # noqa: E402
    SelectElectrodesFromBothGrids,
    SelectElectrodesOverSpeechAreas,
    default_layout,
    motor_grid,
    speech_grid,
)

logger = logging.getLogger("decode_online.py")


class NeuroprosthesisSettings(ez.Settings):
    """Global settings for the speech neuroprosthesis system."""

    destination_dir: str
    address: str
    fs: int
    package_size: int
    port: int = 5556
    bad_channels: Optional[Iterable] = None
    decoding_model_weights: Optional[Path] = None
    vad_model_weights: Optional[Path] = None
    normalization_statistics: Optional[Path] = None
    block_size: int = 256
    vocoder_backend: str = "dsp"
    vocoder_weights: Optional[str] = None
    idle_timeout: Optional[float] = None
    # Fuse front-end + nVAD into one device dispatch per packet (halves the
    # per-packet round trips; identical outputs).
    fused_frontend: bool = False
    # Fuse decode + vocode into one device dispatch per word (halves the
    # per-word round trips; both stages share one prewarmed length bucket).
    fused_decoder: bool = False
    # Chunked audio emission on the fused word path: ship the first 0.5 s
    # of a word as soon as it is synthesized instead of waiting for the
    # whole word (bit-identical concatenated output; net backend only).
    chunked_emission: bool = True
    # Segment-length padding bucket and startup-prewarm list for the word
    # path; tune per deployment with tools/bucket_sweep.py over log.vad.lab.
    segment_length_multiple: int = 50
    segment_prewarm_frames: Tuple[int, ...] = (50, 150, 200, 250, 300)


class Neuroprosthesis(ez.System):
    """Closed-loop system: VAD-gated segments are decoded to acoustic
    features and vocoded into audible speech, per completed word/phrase."""

    CONNECTOR = ZMQConnector()
    FEATURE_EXTRACTOR = HighGammaActivity()
    SPEECH_FILTER = FilterSpeechSegments()
    FUSED_FRONTEND = FusedFrontendVad()
    DECODING_MODEL = RecurrentNeuralDecodingModel()
    WAVEFORM_GENERATOR = DelayedLPCNetVocoder()
    DECODE_VOCODE = FusedDecoderVocoder()
    LOUDSPEAKER = DelayedStdoutForSoX()

    RAW_LOGGER = BinaryLogger()
    HGA_LOGGER = BinaryLogger()
    VAD_LOGGER = VoiceActivityDetectionLogger()
    LPC_LOGGER = BinaryLogger()
    WAV_LOGGER = DelayedWavLogger()

    SETTINGS: NeuroprosthesisSettings

    def configure_feature_transforms(self) -> Tuple[Any, Any, int]:
        select_both_grids = SelectElectrodesFromBothGrids()
        pre_transforms = [select_both_grids]

        car = CommonAverageReferencing(
            exclude_channels=[19, 38, 48, 52],
            grids=[speech_grid(), motor_grid()],
            layout=default_layout(),
        )
        pre_transforms.append(car)

        channel_selection = SelectElectrodesOverSpeechAreas()
        pre_transforms.append(channel_selection)

        if self.SETTINGS.normalization_statistics is None:
            logger.info(
                "Found no normalization data. Going to use zero-mean and "
                "unit-variance."
            )
            channel_means = np.zeros(128, dtype=np.float32)
            channel_stds = np.ones(128, dtype=np.float32)
        else:
            path = Path(self.SETTINGS.normalization_statistics)
            logger.info(f"Found normalizations statistics in {path.as_posix()}.")
            statistics = np.load(path.as_posix())
            if statistics.shape[1] == len(channel_selection):
                # Statistics already in selected-channel space.
                post = ZScoreNormalization(statistics[0], statistics[1])
                return pre_transforms, post, len(channel_selection)
            channel_means = statistics[0, :]
            channel_stds = statistics[1, :]

        post_transforms = ZScoreNormalization(
            channel_means=channel_selection(channel_means.reshape((1, -1))),
            channel_stds=channel_selection(channel_stds.reshape((1, -1))),
        )
        return pre_transforms, post_transforms, len(channel_selection)

    def configure(self) -> None:
        self.CONNECTOR.apply_settings(ZMQConnectorSettings(
            fs=self.SETTINGS.fs, address=self.SETTINGS.address,
            port=self.SETTINGS.port,
            idle_timeout=self.SETTINGS.idle_timeout,
        ))

        pre_transforms, post_transforms, nb_features = \
            self.configure_feature_transforms()
        nb_electrodes = len(SelectElectrodesOverSpeechAreas())
        if self.SETTINGS.fused_frontend:
            delattr(self, "FEATURE_EXTRACTOR")
            delattr(self, "SPEECH_FILTER")
            self.FUSED_FRONTEND.apply_settings(FusedFrontendVadSettings(
                nb_features=nb_features, fs=self.SETTINGS.fs,
                buffer_size=2000, context_frames=50,
                pre_transforms=pre_transforms,
                post_transforms=[post_transforms],
                package_size=self.SETTINGS.package_size, raw_channels=129,
                vad_architecture=UnidirectionalVoiceActivityDetector,
                vad_weights_path=(
                    Path(self.SETTINGS.vad_model_weights)
                    if self.SETTINGS.vad_model_weights is not None else None
                ),
                vad_parameters=dict(nb_layer=2, nb_hidden_units=150,
                                    nb_electrodes=nb_electrodes),
            ))
        else:
            delattr(self, "FUSED_FRONTEND")
        self.FEATURE_EXTRACTOR.apply_settings(HighGammaActivitySettings(
            fs=self.SETTINGS.fs, nb_electrodes=nb_features,
            pre_transforms=pre_transforms, post_transforms=[post_transforms],
            package_size=self.SETTINGS.package_size,
            raw_channels=129,  # BCI2000 exports: 128 ECoG + 1 audio channel
        ))

        logger.info(f"VAD model weights: {self.SETTINGS.vad_model_weights}")
        self.SPEECH_FILTER.apply_settings(FilterSpeechSegmentsSettings(
            nb_features=nb_features, fs=self.SETTINGS.fs, buffer_size=2000,
            context_frames=50,
            vad_architecture=UnidirectionalVoiceActivityDetector,
            vad_weights_path=(
                Path(self.SETTINGS.vad_model_weights)
                if self.SETTINGS.vad_model_weights is not None else None
            ),
            vad_parameters=dict(nb_layer=2, nb_hidden_units=150,
                                nb_electrodes=nb_electrodes),
        ))

        logger.info(
            f"Decoding model weights: {self.SETTINGS.decoding_model_weights}"
        )
        logger.info(
            f"Vocoder: backend={self.SETTINGS.vocoder_backend} "
            f"weights={self.SETTINGS.vocoder_weights} "
            f"fused_decoder={self.SETTINGS.fused_decoder} "
            f"chunked_emission={self.SETTINGS.chunked_emission}"
        )
        # (Re-)logged here because build_neuroprostetics_settings runs
        # before the log handlers are installed.
        logger.info(
            f"Segment buckets: length_multiple="
            f"{self.SETTINGS.segment_length_multiple} prewarm="
            f"{list(self.SETTINGS.segment_prewarm_frames)}"
        )
        decoding_weights = (
            str(self.SETTINGS.decoding_model_weights)
            if self.SETTINGS.decoding_model_weights is not None else None
        )
        decoder_params = dict(nb_layer=2, nb_hidden_units=100,
                              nb_electrodes=nb_electrodes)
        buckets = dict(
            length_multiple=self.SETTINGS.segment_length_multiple,
            prewarm_frames=tuple(self.SETTINGS.segment_prewarm_frames),
        )
        if self.SETTINGS.fused_decoder:
            delattr(self, "DECODING_MODEL")
            delattr(self, "WAVEFORM_GENERATOR")
            self.DECODE_VOCODE.apply_settings(FusedDecoderVocoderSettings(
                path_to_model_weights=decoding_weights,
                model=BidirectionalSpeechSynthesisModel,
                params=decoder_params,
                vocoder_backend=self.SETTINGS.vocoder_backend,
                vocoder_weights=self.SETTINGS.vocoder_weights,
                chunk_emission=self.SETTINGS.chunked_emission,
                **buckets,
            ))
        else:
            delattr(self, "DECODE_VOCODE")
            self.DECODING_MODEL.apply_settings(
                RecurrentNeuralDecodingModelSettings(
                    path_to_model_weights=decoding_weights,
                    model=BidirectionalSpeechSynthesisModel,
                    params=decoder_params,
                    **buckets,
                ))
            self.WAVEFORM_GENERATOR.apply_settings(
                DelayedLPCNetVocoderSettings(
                    backend=self.SETTINGS.vocoder_backend,
                    weights=self.SETTINGS.vocoder_weights,
                ))

        dest = self.SETTINGS.destination_dir
        from dss_tpu.runtime.units import SoXOutputSettings

        self.LOUDSPEAKER.apply_settings(SoXOutputSettings(
            budget_path=os.path.join(dest, "latency_budget.json")))
        self.RAW_LOGGER.apply_settings(LoggerSettings(
            filename=os.path.join(dest, "log.raw.f64"), overwrite=True))
        self.HGA_LOGGER.apply_settings(LoggerSettings(
            filename=os.path.join(dest, "log.hga.f64"), overwrite=True))
        self.VAD_LOGGER.apply_settings(LoggerSettings(
            filename=os.path.join(dest, "log.vad.lab"), overwrite=True))
        self.LPC_LOGGER.apply_settings(LoggerSettings(
            filename=os.path.join(dest, "log.lpc.f32"), overwrite=True))
        self.WAV_LOGGER.apply_settings(DelayedWavLoggerSettings(
            base_path=Path(os.path.join(dest, "reco")), prefix="reco",
            overwrite=True))

    def network(self) -> ez.NetworkDefinition:
        # Packet path: ingest -> features -> VAD-gated segments (+ taps).
        if self.SETTINGS.fused_frontend:
            edges = [
                (self.CONNECTOR.OUTPUT, self.FUSED_FRONTEND.INPUT),
                (self.CONNECTOR.OUTPUT, self.RAW_LOGGER.INPUT),
                (self.FUSED_FRONTEND.FEATURES, self.HGA_LOGGER.INPUT),
                (self.FUSED_FRONTEND.OUTPUT, self.VAD_LOGGER.INPUT),
            ]
            segments_out = self.FUSED_FRONTEND.OUTPUT
        else:
            edges = [
                (self.CONNECTOR.OUTPUT, self.FEATURE_EXTRACTOR.INPUT),
                (self.FEATURE_EXTRACTOR.OUTPUT, self.SPEECH_FILTER.INPUT),
                (self.CONNECTOR.OUTPUT, self.RAW_LOGGER.INPUT),
                (self.FEATURE_EXTRACTOR.OUTPUT, self.HGA_LOGGER.INPUT),
                (self.SPEECH_FILTER.OUTPUT, self.VAD_LOGGER.INPUT),
            ]
            segments_out = self.SPEECH_FILTER.OUTPUT

        # Word path: segments -> acoustic features -> audio (+ taps).
        if self.SETTINGS.fused_decoder:
            edges += [
                (segments_out, self.DECODE_VOCODE.INPUT),
                (self.DECODE_VOCODE.LPC, self.LPC_LOGGER.INPUT),
                # OUTPUT carries in-order audio chunks (first chunk ships
                # before the rest of the word is synthesized); WORD carries
                # the concatenated word for the per-segment reco wav tap.
                (self.DECODE_VOCODE.OUTPUT, self.LOUDSPEAKER.INPUT),
                (self.DECODE_VOCODE.WORD, self.WAV_LOGGER.INPUT),
            ]
        else:
            edges += [
                (segments_out, self.DECODING_MODEL.INPUT),
                (self.DECODING_MODEL.OUTPUT, self.WAVEFORM_GENERATOR.INPUT),
                (self.WAVEFORM_GENERATOR.OUTPUT, self.LOUDSPEAKER.INPUT),
                (self.DECODING_MODEL.OUTPUT, self.LPC_LOGGER.INPUT),
                (self.WAVEFORM_GENERATOR.OUTPUT, self.WAV_LOGGER.INPUT),
            ]
        return tuple(edges)


def main(settings: NeuroprosthesisSettings) -> None:
    system = Neuroprosthesis(settings)
    ez.run_system(system)


def build_neuroprostetics_settings(settings_filename: str, run_name: str,
                                   overwrite: bool) -> NeuroprosthesisSettings:
    settings_config = configparser.ConfigParser()
    settings_config.read(settings_filename)

    def optional(section, key, conv=lambda v: v):
        try:
            value = settings_config.get(section, key)
        except (configparser.NoOptionError, configparser.NoSectionError):
            return None
        return None if value == "" else conv(value)

    decoding_model_weights = optional("Decoding", "decoding_model_weights", Path)
    vad_model_weights = optional("Decoding", "vad_model_weights", Path)
    bad_channels = optional("Decoding", "bad_channels", json.loads)
    normalization_statistics = optional(
        "Decoding", "initial_normalization_statistics", Path)
    vocoder_backend = optional("Decoding", "vocoder_backend") or "dsp"
    vocoder_weights = optional("Decoding", "vocoder_weights")
    if vocoder_backend == "net" and not vocoder_weights:
        # Fall back to the repo's shipped checkpoint (random init would
        # produce noise audio). The resolved path is logged by configure().
        from dss_tpu.vocoder import packaged_weights

        vocoder_weights = packaged_weights()
    idle_timeout = optional("Decoding", "idle_timeout", float)
    # auto (default): fuse frontend+VAD into one device program when running
    # on an accelerator — halves the per-packet dispatch round trips, which
    # dominate packet latency on remote/tunneled devices. Explicit
    # true/false still forces either wiring (behavior is identical; both
    # are covered by the end-to-end tests).
    fused_raw = (optional("Decoding", "fused_frontend") or "auto").lower()
    if fused_raw == "auto":
        import jax

        fused_frontend = jax.default_backend() != "cpu"
    else:
        fused_frontend = fused_raw in ("1", "true", "yes")
    # Same auto policy for the per-word fused decode+vocode program; it
    # needs the device-side (net) vocoder to pay off, so auto requires both
    # an accelerator and backend=net.
    fused_dec_raw = (optional("Decoding", "fused_decoder") or "auto").lower()
    if fused_dec_raw == "auto":
        import jax

        fused_decoder = (jax.default_backend() != "cpu"
                         and vocoder_backend == "net")
    else:
        fused_decoder = fused_dec_raw in ("1", "true", "yes")
    chunked_raw = (optional("Decoding", "chunked_emission") or "true").lower()
    chunked_emission = chunked_raw in ("1", "true", "yes", "auto")
    # Word-path padding buckets (tools/bucket_sweep.py prints these two
    # lines ready to paste from observed log.vad.lab distributions).
    segment_length_multiple = optional(
        "Decoding", "segment_length_multiple", int) or 50
    # None means "key absent" — an explicitly configured empty list ([])
    # disables prewarming rather than falling back to the defaults.
    prewarm_raw = optional("Decoding", "segment_prewarm_frames",
                           lambda v: tuple(json.loads(v)))
    segment_prewarm_frames = ((50, 150, 200, 250, 300)
                              if prewarm_raw is None else prewarm_raw)
    # Opt-in auto bucket policy: point segment_policy_labs at prior runs'
    # log.vad.lab files (space-separated paths/globs) and both settings
    # above are derived from the deployment's OWN observed segment-length
    # distribution — every bucket the sessions actually hit prewarms at
    # startup, none compiles at stream time.  Overrides the explicit keys.
    policy_labs = optional("Decoding", "segment_policy_labs")
    if policy_labs:
        import glob as _glob

        from dss_tpu.runtime.bucket_policy import (
            choose_policy,
            load_lab_lengths,
        )

        lab_paths = [p for pat in policy_labs.split()
                     for p in sorted(_glob.glob(pat))]
        lengths = (load_lab_lengths(lab_paths) if lab_paths
                   else np.zeros(0, np.int64))
        if len(lengths) >= 5:
            segment_length_multiple, segment_prewarm_frames = \
                choose_policy(lengths)
            logger.info(
                f"Bucket policy from {len(lab_paths)} lab file(s), "
                f"{len(lengths)} segments: length_multiple="
                f"{segment_length_multiple}, prewarm="
                f"{list(segment_prewarm_frames)}")
        else:
            logger.warning(
                f"segment_policy_labs matched {len(lengths)} segment(s) "
                f"(< 5) — keeping configured/default buckets")

    base_out_dir = settings_config.get("Decoding", "base_out_dir")
    destination_dir = os.path.join(base_out_dir, run_name)

    return NeuroprosthesisSettings(
        destination_dir=destination_dir,
        address=settings_config.get("Decoding", "address"),
        port=settings_config.getint("Decoding", "port", fallback=5556),
        fs=settings_config.getint("Decoding", "fs"),
        package_size=settings_config.getint("Decoding", "package_size"),
        bad_channels=bad_channels,
        decoding_model_weights=decoding_model_weights,
        vad_model_weights=vad_model_weights,
        normalization_statistics=normalization_statistics,
        block_size=settings_config.getint("Decoding", "block_size"),
        vocoder_backend=vocoder_backend,
        vocoder_weights=vocoder_weights,
        idle_timeout=idle_timeout,
        fused_frontend=fused_frontend,
        fused_decoder=fused_decoder,
        chunked_emission=chunked_emission,
        segment_length_multiple=segment_length_multiple,
        segment_prewarm_frames=segment_prewarm_frames,
    )


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Real-time speech synthesis from neural signals with "
                    "delayed acoustic feedback.")
    parser.add_argument("config", help="Path of the config file on how to set "
                                       "up the BCI system.")
    parser.add_argument("--profile-dir", default=None,
                        help="Capture a jax.profiler trace of the run into "
                             "this directory (TensorBoard-viewable).")
    parser.add_argument("--platform", default=None,
                        help="Force a JAX platform (e.g. 'cpu', 'tpu'). "
                             "Useful when the default device is remote or "
                             "shared and per-packet dispatch latency matters.")
    parser.add_argument("--run", required=False, default="test_run",
                        help="Name of the run folder in which (intermediate) "
                             "results are stored.")
    parser.add_argument("--overwrite", required=False, default=False,
                        action="store_true",
                        help="Overwrite the run folder if it already exists.")

    args = parser.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    settings = build_neuroprostetics_settings(args.config, args.run,
                                              args.overwrite)
    try:
        os.makedirs(settings.destination_dir, exist_ok=args.overwrite)
    except FileExistsError:
        logger.error("The file path of the destination directory already "
                     "exists and the --overwrite flag is not set.")
        sys.exit(1)

    log_filename = os.path.join(settings.destination_dir, "log.run.txt")
    logging.basicConfig(
        level=logging.INFO,
        format="[%(asctime)s] [%(name)-30s] [%(levelname)8s]: %(message)s",
        datefmt="%d.%m.%y %H:%M:%S",
        handlers=[logging.FileHandler(log_filename, "w+"),
                  logging.StreamHandler(sys.stderr)],
    )

    overwrite = "--overwrite" if args.overwrite else ""
    logger.info(f"python decode_online.py {args.config} --run {args.run} {overwrite}")
    logger.info(f"Setting destination dir to {settings.destination_dir}")

    if args.profile_dir:
        from dss_tpu.utils.profiling import device_trace

        with device_trace(args.profile_dir):
            main(settings)
    else:
        main(settings)
