"""Host-side sources and sinks: WAV files, the KiwiSDR wire protocol,
WebSocket transport, rig control (hamlib rigctld), audio output. These feed
the device pipeline at the mesh edge; no DSP lives here."""
