"""Hamlib rigctl TCP server — ``misc_modules/rigctl_server`` capability.

Implements the NET rigctl command subset the reference handles
(``rigctl_server/src/main.cpp:347-415``): F/f (set/get frequency),
compound single-letter commands, AOS/LOS (recorder start/stop),
\\dump_state, q/Q.  Drives tune/record callbacks instead of module-comm.
"""

from __future__ import annotations

import socket
import threading

DUMP_STATE = (
    "0\n2\n2\n150000.000000 1500000000.000000 0x1ff -1 -1 0x10000003 0x3\n"
    "0 0 0 0 0 0 0\n0 0 0 0 0 0 0\n0x1ff 1\n0x1ff 0\n0 0\n0x1e 2400\n"
    "0x2 500\n0x1 8000\n0x1 2400\n0x20 15000\n0x20 8000\n0x40 230000\n"
    "0 0\n9990\n9990\n10000\n0\n10 \n10 20 30 \n0x3effffff\n0x3effffff\n"
    "0x7fffffff\n0x7fffffff\n0x7fffffff\n0x7fffffff\n"
)


class RigctlServer:
    def __init__(
        self,
        host: str = "127.0.0.1",
        port: int = 4532,
        get_freq=None,
        set_freq=None,
        start_recorder=None,
        stop_recorder=None,
    ):
        self.get_freq = get_freq or (lambda: 0.0)
        self.set_freq = set_freq or (lambda f: None)
        self.start_recorder = start_recorder or (lambda: None)
        self.stop_recorder = stop_recorder or (lambda: None)
        self._alive = True
        self._listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._listener.bind((host, port))
        self._listener.listen(1)
        self._thread = threading.Thread(target=self._accept_loop, daemon=True)
        self._thread.start()

    @property
    def port(self) -> int:
        return self._listener.getsockname()[1]

    def _accept_loop(self):
        while self._alive:
            try:
                conn, _ = self._listener.accept()
            except OSError:
                return
            threading.Thread(
                target=self._client_loop, args=(conn,), daemon=True
            ).start()

    def _client_loop(self, conn: socket.socket):
        buf = b""
        while self._alive:
            try:
                data = conn.recv(4096)
            except OSError:
                break
            if not data:
                break
            buf += data
            while b"\n" in buf:
                line, buf = buf.split(b"\n", 1)
                resp = self.handle_command(line.decode(errors="replace").strip())
                if resp is None:  # quit
                    conn.close()
                    return
                if resp:
                    try:
                        conn.sendall(resp.encode())
                    except OSError:
                        return
        conn.close()

    def handle_command(self, cmd: str) -> str | None:
        parts = [p for p in cmd.split(" ") if p]
        if not parts:
            return ""
        op = parts[0]
        # compound single-letter commands like "fF" (main.cpp:376-383)
        if len(op) > 1 and not op.startswith("\\") and op not in ("AOS", "LOS"):
            args = cmd[len(op):]
            out = []
            for c in op:
                r = self.handle_command(c + args)
                if r is None:
                    return None
                out.append(r)
            return "".join(out)

        if op in ("F", "\\set_freq"):
            try:
                self.set_freq(float(parts[1]))
                return "RPRT 0\n"
            except (IndexError, ValueError):
                return "RPRT -1\n"
        if op in ("f", "\\get_freq"):
            return f"{self.get_freq():.0f}\n"
        if op == "AOS":
            self.start_recorder()
            return "RPRT 0\n"
        if op == "LOS":
            self.stop_recorder()
            return "RPRT 0\n"
        if op in ("\\dump_state",):
            return DUMP_STATE
        if op in ("q", "Q", "\\quit"):
            return None
        if op in ("v", "\\get_vfo"):
            return "VFOA\n"
        return "RPRT 0\n"

    def close(self):
        self._alive = False
        self._listener.close()
