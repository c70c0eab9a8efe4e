"""Multi-chip sharded pipeline step on the virtual 8-device CPU mesh."""

import numpy as np
import jax

from ohpipeline_tpu import parallel
from ohpipeline_tpu.core import events as ev
from ohpipeline_tpu.core.streaminfo import PcmStreamInfo
from ohpipeline_tpu.pipeline.branch import Brancher, IciBranch


class TestShardedStep:
    def test_mesh_shape(self):
        mesh = parallel.make_mesh(8)
        assert mesh.devices.size == 8 and mesh.axis_names == ("dp", "sp")

    def test_full_step_all_stages(self):
        mesh = parallel.make_mesh(8)
        dp = mesh.devices.shape[0]
        nframes = max(8, dp * 2)
        args = parallel.example_step_args(nframes=nframes, n=1024)
        rng = np.random.default_rng(3)
        B = dp * 2
        aac_spec = rng.standard_normal((4, B, 1024)).astype(np.float32)
        aac_opidx = np.zeros((4, B), np.int32)
        aac_ov = np.zeros((B, 1024), np.float32)
        v_spec = rng.standard_normal((B, 1024)).astype(np.float32)
        step = parallel.sharded_pipeline_step(mesh, num_channels=2)
        with mesh:
            rendered, meters, aac_pcm, new_ov, vtime = step(
                *args, aac_spec, aac_opidx, aac_ov, v_spec)
            rendered.block_until_ready()
        assert rendered.shape == (nframes, 2, 1024)
        assert meters.shape == (nframes,)
        assert aac_pcm.shape == (4, B, 1024)
        assert vtime.shape == (B, 2048)
        # the meters collective replicates across every device
        assert len(set(d.device for d in meters.addressable_shards)) == 8
        # vorbis IMDCT matches the single-device reference op
        from ohpipeline_tpu.codecs.vorbis.synthesis import imdct_many
        ref = imdct_many(v_spec, 2048)
        np.testing.assert_allclose(np.asarray(vtime), ref, atol=1e-3)


class _Up:
    def __init__(self, events):
        self._ev = list(events)

    def pull(self):
        return self._ev.pop(0)


class TestIciBranch:
    """Multiroom distribution THROUGH the pipeline: a Brancher tee feeds
    IciBranch, whose fan-out collective must land the identical master
    mix on every device of the mesh (the OhmSender semantics of
    Av/Songcast over ICI instead of UDP)."""

    def test_pipeline_multiroom_fanout(self):
        mesh = parallel.make_mesh(8)
        info = PcmStreamInfo(sample_rate=44100, bit_depth=16,
                             num_channels=2)
        rng = np.random.default_rng(11)
        pcm = rng.integers(-30000, 30000, (2, 2500)).astype(np.int32)
        events = [
            ev.DecodedStreamEvent(stream_id=1, info=info),
            # uneven event sizes exercise the tile re-blocking
            ev.AudioPcmEvent(pcm[:, :700], info),
            ev.AudioPcmEvent(pcm[:, 700:], info),
            ev.HaltEvent(),
        ]
        tee = Brancher(_Up(events), "tee")
        ici = IciBranch(mesh)
        tee.attach(ici)
        for _ in range(len(events)):
            tee.pull()

        # 2500 samples = 2 full tiles + a zero-padded halt tile
        assert ici.tiles_sent == 3
        rooms = ici.rooms()
        assert len(rooms) == 8
        tail = np.zeros((2, IciBranch.TILE), np.float32)
        tail[:, :2500 - 2048] = pcm[:, 2048:].astype(np.float32)
        for room in rooms:
            np.testing.assert_array_equal(room, tail)
        assert ici.peak == float(np.abs(tail).max())
