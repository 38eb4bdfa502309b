"""Graceful preemption: SIGTERM -> collective checkpoint -> clean exit.

Cloud TPU maintenance/spot reclaim delivers SIGTERM; train/preemption.py
turns it into one final checkpoint and a normal return (resume is the
ordinary --load_checkpoint path). The reference has no equivalent — its
SLURM scripts requeue and lose progress since the last periodic save.
"""
import os
import signal
import threading

import pytest

from audiossl_tpu.config import load_config
from audiossl_tpu.data.make_test_wavs import make
from audiossl_tpu.train.preemption import PreemptionGuard


@pytest.fixture(scope="module")
def wav_dir(tmp_path_factory):
    return make(str(tmp_path_factory.mktemp("wavs")), n=16)


class TestPreemptionGuard:
    def test_sigterm_sets_flag_and_restores_handler(self):
        before = signal.getsignal(signal.SIGTERM)
        with PreemptionGuard() as guard:
            assert not guard.requested_locally()
            assert not guard.should_stop()
            # a real signal through the real handler (python delivers it at
            # the next bytecode boundary in the main thread)
            os.kill(os.getpid(), signal.SIGTERM)
            assert guard.requested_locally()
            assert guard.should_stop()
        assert signal.getsignal(signal.SIGTERM) is before

    def test_single_process_should_stop_without_signal(self):
        with PreemptionGuard() as guard:
            assert guard.should_stop() is False


class TestTrainLoopPreemption:
    def test_upstream_loop_saves_and_exits_on_sigterm(self, wav_dir, tmp_path):
        """SIGTERM mid-training -> checkpoint at the stop step, clean return,
        exact resume. A background thread re-sends SIGTERM every 2 s until
        the loop reacts; a SIG_IGN fallback covers shots landing before the
        loop's guard installs (during loader/state setup), so the test never
        races the default terminate action."""
        from audiossl_tpu.train import checkpoint as ckpt
        from audiossl_tpu.train.loop import train_upstream

        cfg = load_config(None, "delores_s")
        cfg["run"].update(
            batch_size=8, epochs=50, num_dataloader_workers=2,
            save_path=os.path.join(str(tmp_path), "preempt"), log_every=2,
        )
        cfg["pretrain"]["base_encoder"]["output_dim"] = 64
        cfg["pretrain"]["projection_dim"] = 32
        csv = os.path.join(wav_dir, "pretrain.csv")

        done = threading.Event()

        def pester():
            while not done.is_set():
                os.kill(os.getpid(), signal.SIGTERM)
                done.wait(2.0)

        prev = signal.signal(signal.SIGTERM, signal.SIG_IGN)
        pester_t = threading.Thread(target=pester, daemon=True)
        try:
            pester_t.start()
            state, ckpt_dir = train_upstream(cfg, csv, "delores_s", save_every=0)
        finally:
            # join BEFORE restoring the handler: a final in-flight kill must
            # land on the SIG_IGN fallback, not the restored default action
            done.set()
            pester_t.join(timeout=10)
            signal.signal(signal.SIGTERM, prev)

        stop_step = int(state.step)
        # stopped early (the full run would be 50 epochs x 2 steps = 100)
        # with a checkpoint at exactly the stop step
        assert 0 < stop_step < 100
        assert ckpt.latest_step(ckpt_dir) == stop_step

        # resume is the ordinary path and continues from the stop step
        state2, _ = train_upstream(
            cfg, csv, "delores_s", load_checkpoint=ckpt_dir,
            max_steps=stop_step + 1, save_every=0,
        )
        assert int(state2.step) == stop_step + 1
