"""Control plane: receiver/panadapter state machines, band plan, station
databases (EIBI, DX cluster, beacons), memories, server book, QSO logbook.
Host-side, UI-free — any frontend (CLI, headless, web) drives these."""
