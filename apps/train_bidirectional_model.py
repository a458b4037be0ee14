"""Train the bidirectional speech decoding model.

Parity target: reference train_bidirectional_model.py — LeaveOneDayOut with
fixed test/val days, full-sequence BPTT per trial, RMSprop lr=1e-4, MSE,
dropout 0.5, best checkpoint by validation loss, per-epoch synthesis of 30
test + 30 train trials through the asynchronous synthesis queue, first fold
only (replicate.sh stage 4, 20 epochs).
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

from dss_tpu.models import BidirectionalSpeechSynthesisModel  # noqa: E402
from dss_tpu.train import (  # noqa: E402
    AsynchronousSynthesisQueue,
    SequentialSpeechTrials,
    StoreBestModel,
    padded_batches,
)
from dss_tpu.train.trainer_decoder import DecoderTrainer  # noqa: E402
from dss_tpu.utils import LeaveOneDayOut, SelectElectrodesOverSpeechAreas  # noqa: E402

logger = logging.getLogger("train_bidirectional_model.py")


@dataclass
class TrainingConfiguration:
    nb_hidden_units: int
    nb_layer: int
    nb_epochs: int
    batch_size: int
    num_workers: int
    speech_corpus_root: Path
    out_dir: Path
    test_day: str
    valid_day: str
    seed: int = 0
    resume: bool = False
    folds: int = 1


def main(cfg: TrainingConfiguration) -> None:
    out_dir = cfg.out_dir
    E = len(SelectElectrodesOverSpeechAreas())
    logger.info(f"Number of channels: {E}, {SelectElectrodesOverSpeechAreas()}")

    best_model = StoreBestModel(
        filename=os.path.join(out_dir, "best_model.pth"), head_name="regressor"
    )
    try:
        from torch.utils.tensorboard import SummaryWriter

        summary_writer = SummaryWriter(
            log_dir=os.path.join(out_dir, "tensorboard"))
    except Exception:
        summary_writer = None

    feature_files = list(Path(cfg.speech_corpus_root).rglob(
        "KeywordReading_Overt_R*.hdf"))
    if not feature_files:
        feature_files = list(Path(cfg.speech_corpus_root).rglob("*.hdf"))
    groups_by_day = defaultdict(list)
    for feature_file in feature_files:
        groups_by_day[feature_file.parent.name].append(feature_file)

    for sub in ("orig", "reco", "train"):
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)

    kf = LeaveOneDayOut()
    syn_queue = AsynchronousSynthesisQueue(nb_processes=8)
    synthesized_orig = False
    completed_folds = 0
    for train_days, test_day in kf.split(X=groups_by_day.keys(),
                                         start_with_day=cfg.test_day):
        kf_va = LeaveOneDayOut()
        train_days, val_day = next(kf_va.split(train_days,
                                               start_with_day=cfg.valid_day))
        logger.info(
            f"Starting Leave-one-day-out cross validation with {test_day} as "
            f"test and {val_day} as validation day"
        )

        tr_files = [f.as_posix() for f in feature_files
                    if f.parent.name in train_days]
        va_files = [f.as_posix() for f in feature_files
                    if f.parent.name == val_day]
        tr_files = [f for f in tr_files if f not in va_files]
        te_files = sorted(f.as_posix() for f in feature_files
                          if f.parent.name == test_day)

        selection = SelectElectrodesOverSpeechAreas()
        tr_dataset = SequentialSpeechTrials(tr_files, transform=selection)
        va_dataset = SequentialSpeechTrials(va_files, transform=selection)
        te_dataset = SequentialSpeechTrials(te_files, transform=selection)
        logger.info(repr(tr_dataset))

        model = BidirectionalSpeechSynthesisModel(
            nb_layer=cfg.nb_layer, nb_hidden_units=cfg.nb_hidden_units,
            nb_electrodes=E, dropout=0.5,
        )
        trainer = DecoderTrainer(model, learning_rate=1e-4)
        key = jax.random.PRNGKey(cfg.seed)
        key, init_key = jax.random.split(key)
        params, opt_state = trainer.init(init_key)
        start_epoch = 0
        resume_path = os.path.join(out_dir, "train_state.pkl")
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

        rng = np.random.default_rng(cfg.seed)
        for epoch in range(start_epoch, cfg.nb_epochs):
            train_loss = 0.0
            seen = 0
            if cfg.batch_size > 1:
                for xp, yp, m in padded_batches(tr_dataset, cfg.batch_size,
                                                rng=rng):
                    key, dk = jax.random.split(key)
                    params, opt_state, loss = trainer.train_step(
                        params, opt_state, xp, yp, m, dk)
                    train_loss += float(loss)
                    seen += 1
            else:
                order = rng.permutation(len(tr_dataset))
                for idx in order:
                    x, y = tr_dataset[int(idx)]
                    xp, yp, m = trainer.pad_trial(x, y)
                    key, dk = jax.random.split(key)
                    params, opt_state, loss = trainer.train_step(
                        params, opt_state, xp, yp, m, dk)
                    train_loss += float(loss)
                    seen += 1
            final_train_loss = train_loss / max(seen, 1)

            valid_loss = 0.0
            seen = 0
            for i in range(len(va_dataset)):
                x, y = va_dataset[i]
                xp, yp, m = trainer.pad_trial(x, y)
                valid_loss += float(trainer.evaluate(params, xp, yp, m))
                seen += 1
            final_valid_loss = valid_loss / max(seen, 1)

            logger.info(
                f"Epoch {epoch + 1:>04}: Train loss: {final_train_loss:.04f} "
                f"-- Validation loss: {final_valid_loss:.04f}"
            )
            if summary_writer is not None:
                summary_writer.add_scalars(
                    "Training vs. validation loss",
                    {"Train": final_train_loss, "Valid": final_valid_loss},
                    epoch + 1)
            best_model.update(params, validation_loss=final_valid_loss)
            from dss_tpu.train import save_train_state

            save_train_state(os.path.join(out_dir, "train_state.pkl"),
                             params, opt_state, extra={"epoch": epoch + 1})

            # Per-epoch audible regression: synthesize fixed test/train
            # subsets (reference caps both at 30 trials).
            def _predict_subset(dataset, limit=30):
                preds, origs = [], []
                for i in range(min(limit, len(dataset))):
                    x, y = dataset[i]
                    xp, _, m = trainer.pad_trial(x, y)
                    out = np.asarray(trainer.predict(params, xp, m))[0, :len(x)]
                    preds.append(out)
                    origs.append(y)
                return np.vstack(preds), np.vstack(origs)

            test_sentences, orig_sentences = _predict_subset(te_dataset)
            train_sentences, orig_train = _predict_subset(tr_dataset)

            if not synthesized_orig:
                synthesized_orig = True
                orig_filename = os.path.join(out_dir, "orig", "orig.npy")
                np.save(orig_filename, orig_sentences)
                syn_queue.add_job(filename=orig_filename, verbose=0)

                orig_train_filename = os.path.join(out_dir, "orig", "orig_train.npy")
                np.save(orig_train_filename, orig_train)
                syn_queue.add_job(filename=orig_train_filename, verbose=0)

            reco_filename = os.path.join(out_dir, "reco",
                                         f"reco_epoch={epoch + 1:03d}.npy")
            np.save(reco_filename, test_sentences)
            syn_queue.add_job(filename=reco_filename, verbose=0)

            train_filename = os.path.join(out_dir, "train",
                                          f"train_epoch={epoch + 1:03d}.npy")
            np.save(train_filename, train_sentences)
            syn_queue.add_job(filename=train_filename, verbose=0)

        completed_folds += 1
        if completed_folds >= cfg.folds:
            syn_queue.wait()
            # Reference default: only the first fold
            # (train_bidirectional_model.py:246-247); --folds N extends it.
            return


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Train the bidirectional speech decoding model.")
    parser.add_argument("corpus_dir", help="Path to the preprocessed corpus with the .hdf files.")
    parser.add_argument("out_dir", help="Directory in which the model training will be saved.")
    parser.add_argument("--test_day", default="2022_11_04", help="Day used as offline test data.")
    parser.add_argument("--val_day", default="2022_11_03", help="Day used as validation data.")
    parser.add_argument("--epochs", default="100", help="Number of training epochs.")
    parser.add_argument("--resume", action="store_true",
                        help="Resume from out_dir/train_state.pkl if present.")
    parser.add_argument("--batch_size", type=int, default=1,
                        help="Trials per update (padded+masked data "
                             "parallelism; reference recipe uses 1).")
    parser.add_argument("--folds", type=int, default=1,
                        help="Number of leave-one-day-out folds to run "
                             "(reference default: 1).")
    parser.add_argument("--platform", default=None,
                        help="Force a JAX platform (e.g. 'cpu' — on hosts "
                             "with a tunneled remote TPU the per-step RPC "
                             "dominates this small model's step time).")
    args = parser.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    out_dir = Path(args.out_dir)

    train_config = TrainingConfiguration(
        nb_hidden_units=100,
        nb_layer=2,
        nb_epochs=int(args.epochs),
        batch_size=int(getattr(args, "batch_size", 1)),
        num_workers=4,
        speech_corpus_root=Path(args.corpus_dir),
        out_dir=out_dir,
        test_day=args.test_day,
        valid_day=args.val_day,
        resume=getattr(args, 'resume', False),
        folds=int(getattr(args, 'folds', 1)),
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
