"""Train the unidirectional neural VAD model.

Parity target: reference train_unidirectional_vad.py — LeaveOneDayOut with
fixed test/val days, TBPTT k1=k2=50, RMSprop lr=1e-4, CrossEntropy, dropout
0.5, per-epoch validation accuracy + prediction plots, best checkpoint by
accuracy, 8 epochs (replicate.sh stage 3).

TPU re-design: each trial's whole TBPTT loop is one compiled scan (see
dss_tpu.train.trainer_vad); validation batches run padded + masked.
"""

import argparse
import logging
import os
import sys
from collections import defaultdict
from dataclasses import dataclass
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

from dss_tpu.models import UnidirectionalVoiceActivityDetector  # noqa: E402
from dss_tpu.ops.ringbuffer import VoiceActivityDetectionSmoothing  # noqa: E402
from dss_tpu.train import SequentialSpeechTrials, StoreBestModel, padded_batches  # noqa: E402
from dss_tpu.train.trainer_vad import VadTrainer  # noqa: E402
from dss_tpu.utils import LeaveOneDayOut, SelectElectrodesOverSpeechAreas  # noqa: E402

logger = logging.getLogger("train_unidirectional_vad.py")


@dataclass
class TrainingConfiguration:
    nb_hidden_units: int
    nb_layer: int
    nb_epochs: int
    batch_size: int
    num_workers: int
    truncated_sequence_length: int
    speech_corpus_root: Path
    out_dir: Path
    test_day: str
    valid_day: str
    seed: int = 0
    resume: bool = False


def visualize_vad_predictions(pred, orig, speech_probs, filename: Path):
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return
    smoothing = VoiceActivityDetectionSmoothing(nb_features=64, context_frames=5)
    _, smoothed = smoothing.insert(data=np.zeros((len(pred), 64)),
                                   speech_labels=pred)

    fig, ax = plt.subplots(1, 1, num=1, clear=True)
    ax.plot(orig, c="black", linestyle="--")
    ax.plot(smoothed, c="orange")
    ax.plot(speech_probs, c="blue")
    ax.axhline(0.5, c="gray", alpha=0.5)
    ax.set_xlim(0, len(speech_probs))
    ax.set_xlabel("Time [seconds]")
    ax.set_ylabel("Probability")
    ax.set_xticks([0, 100])
    ax.set_xticklabels([0, 1])
    acc = list(pred == orig).count(True) / len(pred) * 100
    ax.set_title(f"Trial accuracy: {acc:.2f}")
    plt.savefig(filename.as_posix(), dpi=72)
    plt.close(fig)


def split_days(feature_files, test_day, valid_day):
    groups_by_day = defaultdict(list)
    for feature_file in feature_files:
        groups_by_day[feature_file.parent.name].append(feature_file)

    kf_te = LeaveOneDayOut()
    kf_va = LeaveOneDayOut()
    train_days, test = next(kf_te.split(X=groups_by_day.keys(),
                                        start_with_day=test_day))
    train_days, val = next(kf_va.split(train_days, start_with_day=valid_day))

    tr = [f.as_posix() for f in feature_files if f.parent.name in train_days]
    va = [f.as_posix() for f in feature_files if f.parent.name == val]
    tr = [f for f in tr if f not in va]
    te = sorted(f.as_posix() for f in feature_files if f.parent.name == test)
    return tr, va, te, test, val


def main(cfg: TrainingConfiguration) -> None:
    try:
        from torch.utils.tensorboard import SummaryWriter

        summary_writer = SummaryWriter(
            log_dir=os.path.join(cfg.out_dir, "tensorboard"))
    except Exception:
        summary_writer = None

    best_model = StoreBestModel(
        filename=os.path.join(cfg.out_dir, "best_model.pth"),
        head_name="classifier",
    )

    feature_files = list(Path(cfg.speech_corpus_root).rglob("*.hdf"))
    os.makedirs(os.path.join(cfg.out_dir, "valid_viz"), exist_ok=True)

    tr_files, va_files, te_files, test_day, val_day = split_days(
        feature_files, cfg.test_day, cfg.valid_day)
    logger.info(
        f"Starting Leave-one-day-out cross validation with {test_day} as "
        f"test and {val_day} as validation day."
    )

    selection = SelectElectrodesOverSpeechAreas()
    tr_dataset = SequentialSpeechTrials(tr_files, transform=selection,
                                        target_specifier="vad_labels")
    va_dataset = SequentialSpeechTrials(va_files, transform=selection,
                                        target_specifier="vad_labels")
    logger.info(repr(tr_dataset))

    model = UnidirectionalVoiceActivityDetector(
        nb_layer=cfg.nb_layer, nb_hidden_units=cfg.nb_hidden_units,
        nb_electrodes=len(selection), dropout=0.5,
    )
    trainer = VadTrainer(model, learning_rate=1e-4,
                         chunk=cfg.truncated_sequence_length)
    key = jax.random.PRNGKey(cfg.seed)
    key, init_key = jax.random.split(key)
    params, opt_state = trainer.init(init_key)
    start_epoch = 0
    resume_path = os.path.join(cfg.out_dir, "train_state.pkl")
    if cfg.resume and os.path.exists(resume_path):
        from dss_tpu.train import load_train_state

        params, opt_state, extra = load_train_state(resume_path)
        start_epoch = int(extra.get("epoch", 0))
        logger.info(f"Resumed training state from epoch {start_epoch}.")

    n_params = sum(np.asarray(p).size for p in jax.tree.leaves(params))
    logger.info(
        f"Total number of trainable parameters of the "
        f"{type(model).__name__} model: {n_params:,}"
    )

    update_steps_counter = 0
    rng = np.random.default_rng(cfg.seed)
    for epoch in range(start_epoch, cfg.nb_epochs):
        train_loss = []
        if cfg.batch_size > 1:
            # TPU-first: data-parallel trials in padded, masked batches.
            for xp, yp, m in padded_batches(
                    tr_dataset, cfg.batch_size, rng=rng,
                    length_multiple=cfg.truncated_sequence_length):
                key, dk = jax.random.split(key)
                params, opt_state, loss = trainer.tbptt_trial(
                    params, opt_state, xp, yp, m, dk)
                train_loss.append(float(loss))
                update_steps_counter += \
                    xp.shape[1] // cfg.truncated_sequence_length
        else:
            order = rng.permutation(len(tr_dataset))
            for idx in order:
                x, y = tr_dataset[int(idx)]
                xp, yp, m = trainer.pad_trial(x, y)
                key, dk = jax.random.split(key)
                params, opt_state, loss = trainer.tbptt_trial(
                    params, opt_state, xp, yp, m, dk)
                train_loss.append(float(loss))
                update_steps_counter += \
                    xp.shape[1] // cfg.truncated_sequence_length

        valid_loss = 0.0
        correct = 0.0
        total = 0.0
        for val_index in range(len(va_dataset)):
            x, y = va_dataset[val_index]
            xp, yp, m = trainer.pad_trial(x, y)
            loss, c, t, probs = trainer.evaluate(params, xp, yp, m)
            valid_loss += float(loss)
            correct += float(c)
            total += float(t)

            T = len(x)
            probs = np.asarray(probs)[0, :T]
            pred = (probs > 0.5).astype(np.int64)
            orig = np.asarray(y).reshape(-1)[:T].astype(np.int64)
            plot = Path(os.path.join(cfg.out_dir, "valid_viz",
                                     f"epoch={epoch + 1:03d}",
                                     f"trial_id={val_index:03d}.png"))
            os.makedirs(plot.parent.as_posix(), exist_ok=True)
            visualize_vad_predictions(pred, orig, probs, plot)

        val_score = correct / max(total, 1)
        logger.info(
            f"Epoch {epoch + 1:>04}: Train loss: "
            f"{sum(train_loss) / max(len(train_loss), 1):.04f} -- Validation "
            f"loss: {valid_loss:.04f} ({update_steps_counter:>6} update "
            f"steps) [Validation Accuracy: {val_score * 100:.02f}]"
        )
        if summary_writer is not None:
            summary_writer.add_scalars(
                "Training vs. validation loss",
                {"Train": sum(train_loss) / max(len(train_loss), 1),
                 "Valid": valid_loss}, epoch + 1)
            summary_writer.add_scalar("Validation accuracy", val_score,
                                      epoch + 1)
        best_model.update(params, validation_acc=val_score,
                          info={"update_steps": update_steps_counter,
                                "epoch": epoch + 1})
        from dss_tpu.train import save_train_state

        save_train_state(os.path.join(cfg.out_dir, "train_state.pkl"),
                         params, opt_state, extra={"epoch": epoch + 1})

    logger.info(
        f"Training finished. Best validation accuracy obtained after "
        f"{best_model.optional_info['update_steps']} update steps "
        f"[epoch {best_model.optional_info['epoch']}]."
    )


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Train the unidirectional VAD model.")
    parser.add_argument("corpus_dir", help="Path to the preprocessed corpus with the .hdf files.")
    parser.add_argument("out_dir", help="Directory in which the model training will be saved.")
    parser.add_argument("--test_day", default="2022_11_04", help="Day used as offline test data.")
    parser.add_argument("--val_day", default="2022_11_03", help="Day used as validation data.")
    parser.add_argument("--epochs", default="8", help="Number of training epochs.")
    parser.add_argument("--resume", action="store_true",
                        help="Resume from out_dir/train_state.pkl if present.")
    parser.add_argument("--batch_size", type=int, default=1,
                        help="Trials per update (padded+masked data "
                             "parallelism; reference recipe uses 1).")
    parser.add_argument("--platform", default=None,
                        help="Force a JAX platform (e.g. 'cpu').")
    args = parser.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    out_dir = Path(args.out_dir)

    train_config = TrainingConfiguration(
        nb_hidden_units=150,
        nb_layer=2,
        nb_epochs=int(args.epochs),
        batch_size=int(getattr(args, "batch_size", 1)),
        num_workers=0,
        truncated_sequence_length=50,
        speech_corpus_root=Path(args.corpus_dir),
        out_dir=out_dir,
        test_day=args.test_day,
        valid_day=args.val_day,
        resume=getattr(args, 'resume', False),
    )

    os.makedirs(out_dir.as_posix(), exist_ok=True)
    logging.basicConfig(
        level=logging.INFO,
        format="[%(asctime)s] [%(name)-30s] [%(levelname)8s]: %(message)s",
        datefmt="%d.%m.%y %H:%M:%S",
        handlers=[logging.FileHandler(os.path.join(out_dir, "training.log"), "w+"),
                  logging.StreamHandler(sys.stderr)],
    )

    main(train_config)
